package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-93 semantics: Holt–Winters replays from a local exact-integer
  * recursion; the fixture calendar matches the oracle's 30-step
  * unroll. */
class Wave93Spec extends SparkSuite {

  test("timeseries_holt_winters: local triple-smoothing replay; 30-day pin") {
    val rows = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"))
      .agg(sum(expr("cast(round(value * 100) as long)")).as("yc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2) * 1000L))
    def hdiv(c: Long, d: Long): Long = c.sign * ((2 * c.abs + d) / (2 * d))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      val byDay = rs.map(r => r._2 -> r._3).toMap
      val d0 = byDay.keys.min; val d1 = byDay.keys.max
      val xs = (d0 to d1).map(d => byDay.getOrElse(d, 0L)).toArray
      val n = xs.length
      // the oracle unrolls exactly 30 steps — the Spark side must see
      // the same calendar or the two silently diverge
      assert(n === 30, s"$tpe calendar is $n days; oracle pins 30")
      val s1 = xs.take(7).sum; val s2 = xs.slice(7, 14).sum
      var l = hdiv(s1, 7); var tr = hdiv(s2 - s1, 49)
      val sea = Array.tabulate(7)(j => xs(j) - l)
      for (tt <- 7 until n) {
        val j = tt % 7; val x = xs(tt)
        val l2 = hdiv(x - sea(j) + l + tr, 2)
        val tr2 = hdiv(tr + (l2 - l), 2)
        sea(j) = hdiv(sea(j) + (x - l2), 2)
        l = l2; tr = tr2
      }
      (1 to 7).map { k =>
        val j = (n - 1 + k) % 7
        (tpe, k.toLong, (l + k * tr + sea(j)).toDouble / 1000)
      }
    }.sortBy(r => (r._1, r._2))
    val out = SparkEntry.queries("timeseries_holt_winters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === expect)
    // structural read: forecast = level + h·trend + seasonal, re-derived
    // from the reported components
    SparkEntry.queries("timeseries_holt_winters")(spark, sf).collect()
      .foreach { r =>
        val f = r.getDouble(2); val l = r.getDouble(3)
        val tr = r.getDouble(4); val sc = r.getDouble(5)
        assert(math.abs(f - (l + r.getLong(1) * tr + sc)) < 1e-6)
      }
  }
}
