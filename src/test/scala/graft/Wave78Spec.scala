package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-78 semantics: Holt replays from a local sequential smoother;
  * the community sweep replays from a local ΔQ argmax + union-find. */
class Wave78Spec extends SparkSuite {

  test("timeseries_holt: local sequential replay; forecast = level + 7·trend") {
    val out = SparkEntry.queries("timeseries_holt")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("yc")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def smHalf(v: BigInt): BigInt = v.signum * ((2 * v.abs + 2) / 4)
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val ys = rows.sortBy(_._2).map(r => BigInt(r._3) * 1000)
      var l = ys.head
      var tr = if (ys.length > 1) ys(1) - ys.head else BigInt(0)
      var errSum = BigInt(0); var nErr = 0L
      ys.drop(1).foreach { y =>
        errSum += (y - (l + tr)).abs; nErr += 1
        val l2 = smHalf(y + l + tr)
        tr = smHalf(tr + (l2 - l)); l = l2
      }
      val (n, lc, tc, f7, mae) = out(tpe)
      assert(n === nErr, s"$tpe steps")
      assert(math.abs(lc - l.toDouble / 1000) < 1e-6, s"$tpe level")
      assert(math.abs(tc - tr.toDouble / 1000) < 1e-6, s"$tpe trend")
      assert(math.abs(f7 - (l + 7 * tr).toDouble / 1000) < 1e-6, s"$tpe fc")
      assert(math.abs(f7 - (lc + 7 * tc)) < 1e-2, s"$tpe fc identity")
      val maeExp = ((2 * errSum * 1000 + nErr) / (2 * BigInt(nErr))).toDouble / 1e6
      assert(math.abs(mae - maeExp) < 1e-6, s"$tpe mae")
      assert(mae >= 0.0)
    }
    assert(out.keySet === daily.map(_._1).toSet)
  }

  test("graph_community_move: local sweep replay; Q improves on singletons") {
    val out = SparkEntry.queries("graph_community_move")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val edges = ops.BrandGraph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bidir = edges.flatMap(e => Seq(e, e.swap))
    val deg = bidir.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val m = edges.length.toLong
    // each node joins its best positive-gain neighbor (min degree, name)
    val choice = bidir.groupBy(_._1).flatMap { case (i, nbrs) =>
      nbrs.map(_._2).filter(j => 2 * m > deg(i) * deg(j))
        .sortBy(j => (deg(j), j)).headOption.map(j => (i, j))
    }.toSeq
    // union-find over chosen edges
    val parent = scala.collection.mutable.Map[String, String]()
    deg.keys.foreach(k => parent(k) = k)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    choice.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(Seq(ri, rj).max) = Seq(ri, rj).min
    }
    val community = deg.keys.map { v =>
      // min label within the component
      v -> deg.keys.filter(u => find(u) == find(v)).min
    }.toMap
    val expected = community.values.toSet.toSeq.sorted.map { c =>
      val members = community.filter(_._2 == c).keys.toSet
      val eIn = edges.count(e => members(e._1) && members(e._2)).toLong
      val dSum = members.toSeq.map(deg).sum
      val qnum = BigInt(4) * eIn * m - BigInt(dSum) * dSum
      val den = BigInt(4) * m * m
      val qmag = (2 * qnum.abs * 1000000 + den) / (2 * den)
      (c, members.size.toLong, eIn, dSum,
        (qnum.signum * qmag).toDouble / 1e6)
    }
    assert(out.toSeq === expected)
    // the sweep's total modularity beats the all-singleton partition,
    // whose Q = -sum (d_v/2m)^2 is strictly negative
    val qTotal = out.map(_._5).sum
    val qSingleton = -deg.values.map(d => (d.toDouble / (2 * m)) * (d.toDouble / (2 * m))).sum
    assert(qTotal > qSingleton)
  }
}
