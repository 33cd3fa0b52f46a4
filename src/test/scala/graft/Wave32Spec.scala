package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-32 semantics: the KM curve is a proper survival function
  * (monotone from <=1, consistent with at-risk accounting), the
  * decomposition's residual is materially smaller than the raw
  * variation it explains. */
class Wave32Spec extends SparkSuite {

  test("events_survival: monotone non-increasing, matches a driver-side KM replay") {
    val rows = SparkEntry.queries("events_survival")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 <= a._4 + 1e-9, "S(t) must not increase")
      case _ => ()
    }
    assert(rows.head._4 <= 1.0 + 1e-9)
    // driver-side replay: hours to first purchase, censored at last obs
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        floor(unix_timestamp(col("ts")) / 3600).cast("long").as("hr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // .toSeq BEFORE .map: mapping a Map to pairs re-materializes a Map
    // and silently dedupes users sharing a duration
    val life = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val t0 = es.map(_._3).min
      val purchases = es.filter(_._2 == "purchase").map(_._3)
      if (purchases.nonEmpty) (purchases.min - t0, 1)
      else (es.map(_._3).max - t0, 0)
    }
    var s = 1.0
    val expect = life.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (dur, ls) =>
      val d = ls.map(_._2).sum
      val nRisk = life.count(_._1 >= dur)
      val out = if (d > 0) {
        s *= 1.0 - d.toDouble / nRisk
        Some(dur -> (nRisk.toLong, d.toLong, s))
      } else None
      out
    }.toMap
    rows.foreach { case (dur, nRisk, d, skm) =>
      val (en, ed, es) = expect(dur)
      assert(nRisk === en && d === ed, s"dur $dur accounting")
      assert(math.abs(skm - es) < 1e-4, s"dur $dur: $skm vs $es")
    }
  }

  test("timeseries_decompose: residual MAD is well below the raw daily MAD") {
    val rows = SparkEntry.queries("timeseries_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .groupBy("event_type", "day").agg(sum("v").as("tot"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    rows.foreach { r =>
      val tpe = r.getString(0)
      val resid = r.getDouble(r.fieldIndex("resid_mad"))
      val tots = daily.filter(_._1 == tpe).map(_._2)
      val mean = tots.sum / tots.length
      val rawMad = tots.map(v => math.abs(v - mean)).sum.toDouble / tots.length / 1e6
      assert(resid < rawMad,
        s"$tpe: residual $resid not below raw variation $rawMad")
      assert(r.getLong(r.fieldIndex("n_days")) > 0)
    }
  }
}
