package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-29 semantics: MAD matches a driver-side computation and is
  * robust where the mean-based score is not; the KS distance is a
  * valid sup-norm bound and the exponential fit reproduces the mean. */
class Wave29Spec extends SparkSuite {

  test("events_anomaly_mad: median/MAD/outliers match a driver-side replay") {
    val out = SparkEntry.queries("events_anomaly_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val vs = rows.map(_._2).sorted
      val med = vs((vs.length - 1) / 2) // lower median
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.length - 1) / 2)
      val outliers = vs.count(v => math.abs(v - med) * 6745 > mad * 35000).toLong
      assert(out(tpe) === ((med, mad, outliers)), s"type $tpe")
    }
  }

  test("events_anomaly_mad: MAD is unmoved by planting one extreme outlier") {
    // robustness property that breaks stddev-based scores: replacing one
    // value with 1e9 shifts the mean/sd wildly but neither median nor MAD
    val vs = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
      .collect().map(_.getLong(0)).sorted
    def med(xs: Array[Long]) = xs.sorted.apply((xs.length - 1) / 2)
    val m0 = med(vs)
    val mad0 = med(vs.map(v => math.abs(v - m0)))
    val planted = vs.updated(vs.length - 1, Long.MaxValue / 4)
    val m1 = med(planted)
    val mad1 = med(planted.map(v => math.abs(v - m1)))
    assert(m0 === m1 && math.abs(mad0 - mad1) <= mad0 / 100)
  }

  test("events_interarrival: ks_d in (0,1); mean gap reproduces 1/lambda") {
    val rows = SparkEntry.queries("events_interarrival")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDouble(r.fieldIndex("ks_d"))
      assert(d > 0.0 && d < 1.0, s"ks_d $d")
      assert(r.getLong(r.fieldIndex("mean_gap_us")) > 0)
    }
    // driver-side KS replay for one type
    val gapsAll = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "view")
      .select(unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2)).map(_._1)
    val gaps = gapsAll.sliding(2).filter(_.length == 2).map(p => p(1) - p(0)).toArray.sorted
    val n = gaps.length.toDouble
    val lambda = n / gaps.map(BigInt(_)).sum.toDouble
    val dMax = gaps.zipWithIndex.map { case (g, idx) =>
      val f = 1.0 - math.exp(-lambda * g)
      math.max((idx + 1) / n - f, f - idx / n)
    }.max
    val got = rows.find(_.getString(0) == "view").get
      .getDouble(rows.head.fieldIndex("ks_d"))
    assert(math.abs(got - dMax) < 1e-4, s"ks $got vs replay $dMax")
  }
}
