package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-61 semantics: Mann-Kendall statistics replay from a local
  * pairwise scan; assortativity replays from a local degree-Pearson. */
class Wave61Spec extends SparkSuite {

  test("timeseries_trend_mk: S, ties and z replay from a local pairwise scan") {
    val rows = SparkEntry.queries("timeseries_trend_mk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 86400)).cast("long").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect().groupBy(_.getString(0)).map { case (et, rs) =>
        et -> rs.groupBy(_.getLong(1)).toSeq
          .map { case (d, v) => d -> v.map(_.getLong(2)).sum }.sortBy(_._1)
      }
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).map(_._2)
      val n = xs.length.toLong
      var sStat = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length)
        sStat += java.lang.Long.signum(xs(j) - xs(i))
      val tie = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === sStat, s"$et S")
      assert(r.getLong(3) === var18, s"$et var18")
      val zNum = if (sStat > 0) (sStat - 1).toDouble
        else if (sStat < 0) (sStat + 1).toDouble else 0.0
      val z = BigDecimal(zNum / math.sqrt(var18 / 18.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - z) < 1e-9, s"$et z")
    }
  }

  test("graph_assortativity: replays from a local degree-Pearson") {
    val row = SparkEntry.queries("graph_assortativity")(spark, sf).collect().head
    val edges = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = edges.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val xy = pairs.toSeq.flatMap { case (p1, p2) =>
      Seq((deg(p1), deg(p2)), (deg(p2), deg(p1)))
    }
    val mm = xy.length.toLong
    val sx = xy.map(_._1).sum
    val sxx = xy.map(a => BigInt(a._1) * a._1).sum
    val sxy = xy.map(a => BigInt(a._1) * a._2).sum
    val num = mm * sxy - BigInt(sx) * sx
    val den = mm * sxx - BigInt(sx) * sx
    val rmag = if (den == 0) BigInt(0) else (2 * num.abs * 1000000 + den) / (2 * den)
    val rm = (if (num < 0) -rmag else rmag).toLong
    assert(row.getLong(0) === mm / 2, "edge count")
    assert(math.abs(row.getDouble(1) - rm / 1e6) < 1e-9, "assortativity")
    assert(math.abs(row.getDouble(1)) <= 1.0)
  }
}
