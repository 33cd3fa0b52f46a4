package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-streaming surface (SURVEY.md §2.9). Each transform takes the
  * streaming events DataFrame (same schema as the static events fixture)
  * and is the readStream twin of a batch query in [[StreamingQueries]] —
  * StreamingSpec drives them with MemoryStream and asserts
  * batch-equivalence plus watermark/late-data behavior the batch oracle
  * can't express.
  *
  * Scale: all stateful ops key their state by (window, type) / user_id /
  * event_id, so state is hash-partitioned across executors and bounded by
  * the watermark horizon — the standard 1000-executor deployment shape.
  */
object Streaming {

  /** 1-hour tumbling counts with a 10-minute watermark (stream_tumbling +
    * stream_watermark_late). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("n"))

  /** Windowed per-type value sums (stream_topk's incremental state):
    * the leaderboard's heavy part — the per-(window, type) totals —
    * aggregates incrementally under the watermark; the final top-k rank
    * is a per-window row_number over this state (batch-equivalence of
    * state + rank proven in Wave22Spec). At scale the state is
    * (windows x types) rows, watermark-bounded. */
  def windowedValueSums(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
        .as("sv_micro"))
      .select(unix_timestamp(col("w.start")).as("wstart"),
        col("event_type"), col("sv_micro"))

  /** Sliding 1-hour/15-minute windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("n"))

  /** Session windows per user, 30-minute gap (stream_session). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"), col("n_events"))

  /** Watermarked exact dedup on event_id (stream_dedup). NOTE: because
    * the dedup key does not include the event-time column, classic
    * dropDuplicates keeps every seen key in state indefinitely — the
    * watermark only gates late input, it does not evict key state. The
    * bounded-state production form is [[dedupEventsWithinWatermark]]. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")

  /** Bounded-state exact dedup (dropDuplicatesWithinWatermark): state
    * for a key is EVICTED once the watermark passes its first-seen
    * event time plus the delay, even though the key itself carries no
    * event-time column. This is the only dedup form whose state is
    * bounded on an unbounded key domain — at 100 TB/day of events,
    * dropDuplicates on a bare key grows state forever, while this holds
    * only the horizon's keys and guarantees duplicate suppression for
    * duplicates arriving within the watermark delay (the at-least-once
    * redelivery window of any real transport). */
  def dedupEventsWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (stream_join): view→purchase conversion
    * pairs per user within 30 minutes. Both sides carry watermarks and the
    * join condition bounds event-time distance, so each side's state is
    * evictable at the watermark horizon — the only join form that runs
    * unbounded streams with bounded state. State is hash-partitioned on
    * user_id. */
  def viewPurchasePairs(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "30 minutes")
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts"))).as("latency_s"))
  }

  /** LEFT OUTER stream-stream interval join (stream_join_outer):
    * conversion pairs PLUS the non-converting views. A matched view
    * emits immediately; an unmatched view emits with NULL purchase
    * columns only once the watermark proves no in-window purchase can
    * still arrive — the abandonment feed a funnel monitor consumes.
    * Same bounded state as the inner form: outer emission is driven by
    * the same watermark-horizon eviction. */
  def viewPurchaseLeftOuter(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "30 minutes")
    views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts"))).as("latency_s"))
  }

  /** Stream-static enrichment join (stream_static_join): each micro-batch
    * joins against the static dimension — Spark re-plans the static side
    * per batch, the dim is broadcast (model-sized), and NO state is kept:
    * the canonical "enrich a 100 TB/day event stream with a dimension
    * table" shape. Aggregation after enrichment keys state by the
    * (segment, type) pair — bounded cardinality. */
  def staticEnrich(events: DataFrame, customers: DataFrame): DataFrame =
    // no broadcast hint: the dim is ENTITY-sized (one row per customer),
    // so the hint is the graph_hits bug class at 100 TB; the planner's
    // size-based selection broadcasts it while it fits and degrades to a
    // shuffle join when it no longer does
    events.join(customers,
        events("user_id") === customers("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Streaming MERGE sink: each micro-batch upserts into a versioned
    * table via foreachBatch — the standard "stream into a lakehouse
    * table" pattern (per-batch transactional commit; history retained,
    * so a bad deploy rolls back by version). EXACTLY-ONCE: the batch id
    * is recorded in the manifest via `upsertBatch`, so foreachBatch's
    * at-least-once re-delivery after a restart replays as a no-op.
    * Returns the started query; the caller owns its lifecycle. */
  def upsertSink(events: DataFrame, store: graft.engine.VersionedStore,
      table: String, keys: Seq[String],
      writerId: String = "upsert-sink"): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          store.upsertBatch(batch.sparkSession, table, batch.toDF(), keys,
            writerId, batchId); ()
        }
      }
      .start()

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class UserState(user_id: Long, n_events: Long, sum_value: Double)

  case class SessionState(events: Long, start: Long, last: Long)
  case class ClosedSession(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Custom sessionization via flatMapGroupsWithState: emits one row per
    * CLOSED session (30-minute inactivity gap), holding only
    * (count, start, last) per live user in state — the arbitrary-state
    * form that session_window cannot express (e.g. per-session emission
    * with custom close rules). Event-time timeout closes idle sessions
    * as the watermark passes; state per user is O(1). */
  def closedSessions(events: Dataset[EventRow]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit the session
            val st = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, st.start, st.last, st.events))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))
            var closed = List.empty[ClosedSession]
            var st = state.getOption.getOrElse(SessionState(0L, 0L, 0L))
            for (r <- sorted) {
              val t = r.ts.getTime
              if (st.events == 0L) st = SessionState(1L, t, t)
              else if (t - st.last > gapMs) {
                closed ::= ClosedSession(uid, st.start, st.last, st.events)
                st = SessionState(1L, t, t)
              } else st = SessionState(st.events + 1, st.start, t)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.last + gapMs)
            closed.reverseIterator
          }
      }
  }

  /** Arbitrary stateful processing v2 (`transformWithState`, the
    * Spark 4 StatefulProcessor API): per-user running totals held in a
    * named, schema'd ValueState — the successor of mapGroupsWithState
    * with composable typed state (value/list/map), per-state TTL, and
    * timers. Requires the RocksDB state store provider (state lives off-
    * heap and spills to disk, so per-key state at 100 TB is bounded by
    * RocksDB, not executor heap). Equivalence with both the v1 form and
    * the batch groupBy is pinned in StreamingSpec. */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserState] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserState]("totals",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[EventRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserState] = {
      val prev = if (totals.exists()) totals.get() else UserState(uid, 0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      rows.foreach { r => n += 1; s += r.value }
      val next = UserState(uid, n, s)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** stream_stateful_count in the v2 API: same semantics as
    * [[statefulUserCounts]], state managed by [[UserTotalsProcessor]]. */
  def statefulUserCountsV2(events: Dataset[EventRow]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Custom keyed state via mapGroupsWithState: running per-user totals
    * (stream_stateful_count). */
  def statefulUserCounts(events: Dataset[EventRow]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { r => n += 1; s += r.value }
          val next = UserState(uid, n, s)
          state.update(next)
          next
      }
  }
}
