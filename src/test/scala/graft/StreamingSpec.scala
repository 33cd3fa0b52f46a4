package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.Tables
import graft.ops.Streaming.EventRow
import graft.ops.{Streaming, StreamingQueries}

/** MemoryStream-driven micro-batch tests (SURVEY.md §5.2 item 5):
  * batch-equivalence of the streaming twins plus the watermark/late-data
  * semantics the DuckDB oracle can't express. */
class StreamingSpec extends SparkSuite {

  import spark.implicits._

  private def fixtureEvents: Seq[EventRow] =
    Tables.load(spark, sf, "events").as[EventRow].collect().toSeq

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click"): EventRow =
    EventRow(id, ts(t), user, typ, 1.0, "{}")

  test("tumbling stream (complete mode) equals batch equivalent") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      val streamed = spark.table("tumb")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = StreamingQueries.queries("stream_tumbling")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment join (complete mode) equals batch equivalent") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val dim = Tables.load(spark, sf, "customer")
    val q = Streaming.staticEnrich(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("complete").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      val streamed = spark.table("enrich")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Streaming.staticEnrich(Tables.load(spark, sf, "events"), dim)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark drops events later than 10 minutes behind max event time") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      // batch 1: two events in hour 10, plus a 12:00 event -> watermark 11:50
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00"),
        ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // batch 2: late event in hour 10 (beyond watermark) must be DROPPED,
      // plus a 14:00 event to advance the watermark past hour 12
      input.addData(ev(4, "2024-01-01 10:05:00"), ev(5, "2024-01-01 14:00:00"))
      q.processAllAvailable()
      val hour10 = spark.table("late")
        .filter(col("wstart") === ts("2024-01-01 10:00:00").getTime / 1000)
        .select("n").collect().map(_.getLong(0))
      assert(hour10.toSeq === Seq(2L), "late event must not be counted")
    } finally q.stop()
  }

  test("streaming dedup drops same event_id across batches within watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds state: dupes inside the horizon drop, evicted keys re-emit") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.dedupEventsWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("dedupww").outputMode("append").start()
    try {
      // batch 1: id 1 seen; duplicate of id 1 within the 10-min horizon drops
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      // batch 2: advance the watermark far past id 1's expiry (10:00 + 10min)
      input.addData(ev(9, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // batch 3: id 1 again, NOT late (>= watermark) — its state was
      // evicted, so unlike dropDuplicates it EMITS a second time: the
      // bounded-state contract (suppression only within the horizon)
      input.addData(ev(1, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      val ids = spark.table("dedupww").select("event_id").collect().map(_.getLong(0))
      assert(ids.count(_ == 1L) === 2, s"got ${ids.toSeq}")
      assert(ids.count(_ == 9L) === 1)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched views with NULLs after the watermark horizon") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.viewPurchaseLeftOuter(input.toDF())
      .writeStream.format("memory").queryName("vpouter").outputMode("append").start()
    try {
      // user 1 converts; user 2's view never converts
      input.addData(
        ev(10, "2024-01-01 10:00:00", user = 1L, typ = "view"),
        ev(11, "2024-01-01 10:10:00", user = 1L, typ = "purchase"),
        ev(20, "2024-01-01 10:05:00", user = 2L, typ = "view"))
      q.processAllAvailable()
      // advance BOTH watermarks far past view 20's join horizon
      // (10:05 + 30min window + 30min delay)
      input.addData(
        ev(30, "2024-01-01 13:00:00", user = 3L, typ = "view"),
        ev(31, "2024-01-01 13:00:00", user = 3L, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("vpouter")
        .select("view_id", "purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((10L, 11L)), s"matched pair missing: $rows")
      assert(rows.contains((20L, -1L)), s"unmatched view must emit with NULL: $rows")
    } finally q.stop()
  }

  test("session windows (streaming) match gap-based batch sessionization counts") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      val streamed = spark.table("sess").groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = StreamingQueries.queries("stream_session")(spark, sf)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sliding stream (complete mode) equals batch equivalent") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slide").outputMode("complete").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      val streamed = spark.table("slide")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = StreamingQueries.queries("stream_sliding")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stateful per-user counts equal batch groupBy at stream end") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.statefulUserCounts(input.toDS())
      .writeStream.format("memory").queryName("stateful").outputMode(OutputMode.Update).start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      // last update per user is the final state
      val streamed = spark.table("stateful")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Tables.load(spark, sf, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("transformWithState (v2 API) matches the v1 form and batch groupBy across batches") {
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventRow]
    // query construction/start sits INSIDE the try: if transformWithState
    // rejects the plan, the finally must still restore the provider conf
    // for the rest of the shared-session suite
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = Streaming.statefulUserCountsV2(input.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode(OutputMode.Update).start()
      // two micro-batches: state must carry totals across batch boundaries
      val (b1, b2) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // n_events strictly increases per update, so the max struct is the
      // final state (max(sum_value) alone would break on negative values)
      val streamed = spark.table("tws")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("sum_value"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.sum_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
      val batch = Tables.load(spark, sf, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))).toSet
      assert(streamed === batch)
    } finally {
      if (q != null) q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join emits exactly the batch twin's pairs") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.viewPurchasePairs(input.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = StreamingQueries.queries("stream_join")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty, "fixture must contain view->purchase conversions")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits closed sessions on gap and on timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.closedSessions(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 40-min gap
      // and a third event -> the first session closes on the gap
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 10:45:00"))
      q.processAllAvailable()
      val afterGap = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(afterGap === Set((1L, 2L)))   // first session: 2 events
      // advance the watermark far past the last event: timeout fires and
      // the open session (1 event) is emitted
      input.addData(ev(99, "2024-01-01 13:00:00", user = 7L))
      q.processAllAvailable()
      input.addData(ev(100, "2024-01-01 15:00:00", user = 7L))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 1L)
        .collect().map(_.getLong(3)).toSeq.sorted
      assert(sessions === Seq(1L, 2L))
    } finally q.stop()
  }

  test("foreachBatch upsert sink merges each micro-batch into a versioned table") {
    implicit val ctx = spark.sqlContext
    val store = new graft.engine.VersionedStore(
      java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString)
    val input = MemoryStream[EventRow]
    val q = Streaming.upsertSink(
      input.toDF().select(col("event_id"), col("event_type"), col("value")),
      store, "ev", Seq("event_id"))
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      assert(store.read(spark, "ev").count() === 2L)
      // batch 2: update event 2, insert event 3
      input.addData(
        EventRow(2L, ts("2024-01-01 10:02:00"), 1L, "purchase", 9.0, "{}"),
        ev(3, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val now = store.read(spark, "ev").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(now === Set((1L, "click"), (2L, "purchase"), (3L, "click")))
      // per-batch commits retained as history: batch-1 state is readable
      assert(store.history("ev").size === 2)
      assert(store.readVersion(spark, "ev", 1L).count() === 2L)
    } finally q.stop()
  }

  test("streamed commits drive CDF rollup maintenance: incremental == recompute") {
    implicit val ctx = spark.sqlContext
    val store = new graft.engine.VersionedStore(
      java.nio.file.Files.createTempDirectory("graft-stream-rollup").toString)
    val input = MemoryStream[EventRow]
    val q = Streaming.upsertSink(
      input.toDF().select(col("event_id"), col("event_type"), col("value")),
      store, "fact", Seq("event_id"))
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      val v1 = store.currentVersion("fact").get
      // materialize the rollup off the first streamed commit
      store.write(store.read(spark, "fact")
        .groupBy("event_type").agg(count(lit(1)).as("n")), "rollup")
      // stream more batches (one updates a key in place — not an insert)
      input.addData(
        EventRow(2L, ts("2024-01-01 10:02:00"), 1L, "purchase", 9.0, "{}"),
        ev(3, "2024-01-01 10:03:00"))
      input.addData(ev(4, "2024-01-01 10:04:00"))
      q.processAllAvailable()
      // churn-file refresh, the sink_incremental_rollup pattern — plus
      // update handling: recompute the full contribution of churn keys
      // (updates may MOVE a key across groups), subtracting their old
      // grain contributions is the delete side; with inserts-only keys
      // here the insert path suffices for inserts, update key re-adds
      val changed = store.changesSince(spark, "fact", v1, Seq("event_id"))
      val insertKeys = changed.filter(col("change_type") === "insert").select("event_id")
      val updateKeys = changed.filter(col("change_type") === "update").select("event_id")
      val churnRows = store.newFileRows(spark, "fact", v1)
      val addDelta = churnRows.join(insertKeys, Seq("event_id"), "left_semi")
        .groupBy("event_type").agg(count(lit(1)).as("dn"))
      // updated keys: remove old-grain contribution, add new-grain
      val oldRows = store.readVersion(spark, "fact", v1)
        .join(updateKeys, Seq("event_id"), "left_semi")
        .groupBy("event_type").agg((count(lit(1)) * -1).as("dn"))
      val newRows = churnRows.join(updateKeys, Seq("event_id"), "left_semi")
        .groupBy("event_type").agg(count(lit(1)).as("dn"))
      val delta = addDelta.union(oldRows).union(newRows)
        .groupBy("event_type").agg(sum("dn").as("dn"))
      val r = store.read(spark, "rollup").as("r")
      val refreshed = r.join(delta.as("dl"),
          col("r.event_type") <=> col("dl.event_type"), "full_outer")
        .select(
          coalesce(col("r.event_type"), col("dl.event_type")).as("event_type"),
          (coalesce(col("r.n"), lit(0L)) + coalesce(col("dl.dn"), lit(0L))).as("n"))
        .filter(col("n") > 0)
      store.write(refreshed, "rollup")
      // incremental result == from-scratch recompute over the live facts
      val got = store.read(spark, "rollup").collect()
        .map(x => (x.getString(0), x.getLong(1))).toSet
      val want = store.read(spark, "fact").groupBy("event_type")
        .agg(count(lit(1)).as("n")).collect()
        .map(x => (x.getString(0), x.getLong(1))).toSet
      assert(got === want, s"incremental $got != recompute $want")
    } finally q.stop()
  }
}
