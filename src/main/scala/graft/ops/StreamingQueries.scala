package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables

/** Batch-equivalent forms of the streaming contract (SURVEY.md §2.9):
  * every streaming query here has the same result as its `readStream`
  * twin in [[Streaming]] run to completion on the static events table,
  * which is what makes the DuckDB oracle applicable. Watermark/late-data
  * semantics are not batch-expressible and live in StreamingSpec only.
  */
object StreamingQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Per-event-type counts in 1-hour tumbling windows. Window start is
    * emitted as epoch seconds: engine-portable, no timestamp-precision
    * drift (SURVEY §7.3). */
  private val tumbling: Q = (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("n"))
      .orderBy("wstart", "event_type")

  /** 1-hour window sliding every 15 minutes: each event lands in 4
    * overlapping windows. */
  private val sliding: Q = (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("n"))
      .orderBy("wstart", "event_type")

  /** Gap-based sessionization, 30-minute gap: batch twin of
    * `session_window` — lag + running sum of new-session flags. One
    * shuffle on user_id; the window sort is per-user. */
  private val session: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    ev(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Exact dedup on event_id (streaming twin: watermark + dropDuplicates).
    * Deterministic survivor: first by event time. */
  private val dedup: Q = (s, dir) => {
    val w = Window.partitionBy("event_id").orderBy(asc("ts"))
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** Running per-user aggregate (streaming twin: outputMode Update /
    * mapGroupsWithState); final state equals the batch groupBy. */
  private val statefulCount: Q = (s, dir) =>
    ev(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        unix_timestamp(max(col("ts"))).as("last_seen"))
      .orderBy("user_id")

  /** Batch twin of the stream-stream interval join: view→purchase pairs
    * within 30 minutes per user. Equi-join on user_id (one shuffle) with
    * the time interval as a residual predicate. */
  /** Batch twin of the LEFT OUTER stream-stream interval join: every
    * view, with its in-window purchase or NULLs — the abandonment feed.
    * Same single user_id shuffle; the outer side adds no state beyond
    * the inner form's horizon. */
  private val streamJoinOuter: Q = (s, dir) => {
    val e = ev(s, dir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    v.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts"))).as("latency_s"))
      .orderBy("view_id", "purchase_id")
  }

  private val streamJoin: Q = (s, dir) => {
    val e = ev(s, dir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    v.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts"))).as("latency_s"))
      .orderBy("view_id", "purchase_id")
  }

  /** End-to-end "stream into the lakehouse" as a registered query: a
    * REAL file-source stream over the customer parquet, micro-batches
    * MERGE-committed into a fresh VersionedStore via the foreachBatch
    * sink ([[Streaming.upsertSink]] — per-batch transactional commit,
    * exactly-once via the recorded (writer, batch) txn), then the
    * committed table is read back and aggregated. The oracle derives
    * the same aggregate from the source table, so a lost, duplicated,
    * or partially-committed batch hash-fails; the version count pins
    * that exactly one commit happened per micro-batch. */
  private val streamUpsertSink: Q = (s, dir) => {
    val root = graft.engine.Fs.freshScratch(s, "streamsink")
    val store = new graft.engine.VersionedStore(root)
    // stage the source as a 3-file landing directory: with
    // maxFilesPerTrigger=1 the stream sees 3 micro-batches, so the sink
    // must commit exactly-once THREE times (any batch order yields the
    // same table: round-robin partitions are key-disjoint)
    val staged = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val incoming = s"$root/incoming"
    staged.repartition(3).write.mode("overwrite").parquet(incoming)
    val src = s.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val q = Streaming.upsertSink(src, store, "customer", Seq("c_custkey"),
      writerId = "stream-upsert-sink")
    try q.processAllAvailable() finally q.stop()
    val nVersions = store.currentVersion("customer").getOrElse(0L)
    store.read(s, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal_sum"))
      .select(col("c_mktsegment"), col("n"), col("bal_sum"),
        lit(nVersions).as("n_versions"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, Q] = Map(
    "stream_upsert_sink" -> streamUpsertSink,
    "stream_tumbling" -> tumbling,
    "stream_sliding" -> sliding,
    "stream_session" -> session,
    "stream_dedup" -> dedup,
    "stream_stateful_count" -> statefulCount,
    "stream_join" -> streamJoin,
    "stream_join_outer" -> streamJoinOuter
  )

  val oracles: Map[String, String] = Map(
    "stream_upsert_sink" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
        |  CAST(3 AS BIGINT) AS n_versions
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "stream_tumbling" ->
      "SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS wstart, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "stream_sliding" ->
      """SELECT wstart, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |SELECT CAST(FLOOR(epoch(ts) / 900) * 900 - k AS BIGINT) AS wstart, event_type
        |FROM events CROSS JOIN (VALUES (0),(900),(1800),(2700)) AS o(k)
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), sessions AS (
        |  SELECT user_id, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM (
        |SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts ASC) AS rn FROM events
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "stream_stateful_count" ->
      "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_seen FROM events GROUP BY user_id ORDER BY user_id",
    "stream_join" ->
      """WITH v AS (SELECT user_id, ts AS view_ts, event_id AS view_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id AS p_user, ts AS purchase_ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase')
        |SELECT user_id, view_id, purchase_id,
        |  CAST(FLOOR(epoch(purchase_ts)) - FLOOR(epoch(view_ts)) AS BIGINT) AS latency_s
        |FROM v JOIN p ON user_id = p_user AND purchase_ts >= view_ts AND purchase_ts <= view_ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, purchase_id""".stripMargin,
    "stream_join_outer" ->
      """WITH v AS (SELECT user_id, ts AS view_ts, event_id AS view_id FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id AS p_user, ts AS purchase_ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase')
        |SELECT user_id, view_id, purchase_id,
        |  CAST(FLOOR(epoch(purchase_ts)) - FLOOR(epoch(view_ts)) AS BIGINT) AS latency_s
        |FROM v LEFT JOIN p ON user_id = p_user AND purchase_ts >= view_ts AND purchase_ts <= view_ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, purchase_id NULLS FIRST""".stripMargin
  )
}
