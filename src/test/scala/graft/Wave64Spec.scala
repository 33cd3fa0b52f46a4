package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-64 semantics: the SRM statistic replays from a local hash
  * split; schema enforcement rejects drifted writes atomically. */
class Wave64Spec extends SparkSuite {

  test("events_srm: chi-square replays from a local hash split") {
    val rows = SparkEntry.queries("events_srm")(spark, sf).collect()
    assert(rows.nonEmpty)
    import java.security.MessageDigest
    def arm(u: Long): Int = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2).toInt
    }
    val ua = Tables.load(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ua.groupBy(_._1)
    rows.foreach { r =>
      val us = byType(r.getString(0)).map(_._2)
      val a = us.count(arm(_) == 0).toLong
      val b = us.count(arm(_) == 1).toLong
      assert(r.getLong(1) === a && r.getLong(2) === b, s"${r.getString(0)} counts")
      val n = a + b
      val chiMicro = (2 * (a - b) * (a - b) * 1000000L + n) / (2 * n)
      assert(math.abs(r.getDouble(3) - chiMicro / 1e6) < 1e-9)
      assert(r.getBoolean(4) === (chiMicro > 3841459L))
    }
  }

  test("sink_schema_reject: strict drift rejected atomically, evolve lands") {
    val rows = SparkEntry.queries("sink_schema_reject")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val strict = rows("append_extra_col_strict")
    assert(!strict._1, "extra column without evolution must be rejected")
    assert(strict._4, "rejection must leave row count unchanged")
    val matching = rows("append_matching")
    assert(matching._1 && matching._4)
    val evolve = rows("append_extra_col_evolve")
    assert(evolve._1, "evolveSchema append must land with null backfill")
    // rejected attempt did not advance the version
    assert(strict._3 === matching._3, "rejected write must not commit a version")
    assert(evolve._3 === matching._3 + 1)
  }

  test("schema enforcement: type divergence is rejected loudly") {
    val root = graft.engine.Fs.freshScratch(spark, "typedrift")
    val store = new graft.engine.VersionedStore(root)
    val base = Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").as("k"), col("n_name").as("name"))
    store.write(base, "t")
    val drifted = base.withColumn("name", lit(42L))
    val e = intercept[IllegalArgumentException] {
      store.upsert(spark, "t", drifted, Seq("k"))
    }
    assert(e.getMessage.contains("diverge"))
    assert(store.currentVersion("t").contains(1L), "no version committed")
  }
}
