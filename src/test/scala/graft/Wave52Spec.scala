package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-52 semantics: moments replay against Spark's own
  * skewness/kurtosis builtins; the heatmap conserves mass and its
  * day-of-week residue is consistent with date_format. */
class Wave52Spec extends SparkSuite {

  test("profile_moments: ties out against Spark skewness/kurtosis builtins") {
    val rows = SparkEntry.queries("profile_moments")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ref = Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(avg("value").as("m"), skewness("value").as("sk"),
        kurtosis("value").as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    rows.foreach { r =>
      val (m, sk, ku) = ref(r.getString(0))
      assert(math.abs(r.getDouble(r.fieldIndex("mean")) - m) < 1e-4)
      assert(math.abs(r.getDouble(r.fieldIndex("skewness")) - sk) < 1e-3,
        s"${r.getString(0)} skew")
      assert(math.abs(r.getDouble(r.fieldIndex("kurtosis_excess")) - ku) < 1e-3,
        s"${r.getString(0)} kurtosis")
    }
  }

  test("events_hour_heatmap: mass conserves; dow matches date_format") {
    val rows = SparkEntry.queries("events_hour_heatmap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum === total)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
    // epoch-residue dow: 0 must correspond to Thursday+3 ... i.e. residue 0
    // is Monday iff (day+4)%7 maps Thursday(=epoch day 0) to 4. Verify one
    // concrete timestamp against Spark's own dayofweek (UTC session).
    val probe = Tables.load(spark, sf, "events")
      .select(unix_timestamp(col("ts")).as("sec"),
        dayofweek(to_utc_timestamp(col("ts"), "UTC")).as("dw"))
      .withColumn("res", pmod(floor(col("sec") / 86400L) + 4L, lit(7L)))
      .select("dw", "res").distinct().collect()
    // dayofweek: 1=Sunday..7=Saturday; residue (day+4)%7: 0=Sunday..6=Saturday
    probe.foreach { r =>
      val dw = r.getInt(0); val res = r.getLong(1)
      assert(res === (dw - 1).toLong, s"dw=$dw res=$res")
    }
  }
}
