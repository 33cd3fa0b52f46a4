package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-94 semantics: the periodogram replays from a local exact-
  * integer DFT over the zero-filled daily series. */
class Wave94Spec extends SparkSuite {

  test("timeseries_periodogram: local exact-DFT replay; one dominant per type") {
    val rows = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val trig = for (p <- 2 to 14; k <- 0 until p) yield {
      val a = 2.0 * math.Pi * k / p
      ((p, k), (math.round(math.cos(a) * 1e6), math.round(math.sin(a) * 1e6)))
    }
    val tm = trig.toMap
    val out = SparkEntry.queries("timeseries_periodogram")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val byDay = rs.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
      val d0 = byDay.keys.min; val d1 = byDay.keys.max
      val xs = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val n = BigInt(xs.length)
      val sSum = xs.map(BigInt(_)).sum
      val xc = xs.map(x => n * x - sSum)
      val powers = (2 to 14).map { p =>
        val c = xc.zipWithIndex.map { case (v, t) => v * tm((p, t % p))._1 }.sum
        val sn = xc.zipWithIndex.map { case (v, t) => v * tm((p, t % p))._2 }.sum
        p -> (c * c + sn * sn)
      }
      val dom = powers.minBy { case (p, pw) => (-pw, p) }._1
      val denom = (n * n * n * n).toDouble * 1e12
      powers.foreach { case (p, pw) =>
        val (gp, gd) = out((tpe, p.toLong))
        assert(math.abs(gp - pw.toDouble / denom) < 1e-9, s"$tpe period $p")
        assert(gd === (p == dom), s"$tpe period $p dominance")
      }
      assert(powers.count { case (p, _) => out((tpe, p.toLong))._2 } === 1)
    }
  }
}
