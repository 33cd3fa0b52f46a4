package graft

import org.apache.spark.sql.functions._

/** Wave-16 semantics: the tolerance band only ever REMOVES matches
  * relative to the unbounded as-of join, the streaming enrichment
  * equals its batch twin, and the IQR fences classify consistently. */
class Wave16Spec extends SparkSuite {

  test("join_asof_tolerance: every tolerated match is an unbounded as-of match, never fresher") {
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf)
      .withColumnRenamed("asof_date", "tol_date")
    val unb = SparkEntry.queries("join_asof")(spark, sf)
    val joined = tol.join(unb, Seq("event_id", "user_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val t = r.getAs[java.sql.Date]("tol_date")
      val u = r.getAs[java.sql.Date]("asof_date")
      // tolerance can only null-out a stale match or agree exactly —
      // the freshest order inside the band IS the freshest overall
      assert(t == null || t == u, s"$r")
    }
    val dropped = joined.count(r =>
      r.getAs[java.sql.Date]("tol_date") == null &&
        r.getAs[java.sql.Date]("asof_date") != null)
    assert(dropped > 0, "fixture should contain stale matches the band rejects")
  }

  test("stream_asof equals the batch as-of aggregate with 3 exactly-once commits") {
    val rows = SparkEntry.queries("stream_asof")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(rows.head.fieldIndex("n_versions")) === 3L))
    import graft.engine.Tables
    val e = Tables.load(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(4)) === 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.load(spark, sf, "orders").select(col("o_custkey"), col("o_orderdate"))
    val batch = ops.Wave16.asofTolerance(e, o)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("asof_date")).as("n_matched"),
        max(col("asof_date")).as("max_asof"))
      .orderBy("user_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("profile_outliers: fences ordered, outliers a minority, counts consistent") {
    val rows = SparkEntry.queries("profile_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, q1, q3, hi) = (r.getDouble(r.fieldIndex("lo")), r.getDouble(r.fieldIndex("q1")),
        r.getDouble(r.fieldIndex("q3")), r.getDouble(r.fieldIndex("hi")))
      assert(lo <= q1 && q1 <= q3 && q3 <= hi)
      val n = r.getLong(r.fieldIndex("n"))
      val out = r.getLong(r.fieldIndex("n_low")) + r.getLong(r.fieldIndex("n_high"))
      // Tukey fences cover at least the interquartile half by construction
      assert(out <= n / 2, s"$out of $n flagged")
    }
  }
}
