package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables

/** Behavioral / product-analytics operators over the `events` stream
  * table: ordered funnel, cohort retention, last-touch attribution,
  * event-transition matrix, and rolling active users — the query family
  * a warehouse profiler like the reference (dbc:cmd12's per-table probe
  * loop) feeds into once tables are profiled.
  *
  * Conventions shared with [[StreamingQueries]]: timestamps are emitted
  * as epoch seconds (engine-portable; `events.ts` has no sub-microsecond
  * component so Spark's micros truncation is lossless), days are
  * `floor(epoch seconds / 86400)`, double sums go through DECIMAL(18,2), and
  * every per-user window orders by `(ts, event_id)` for a total order.
  *
  * Scale notes (100 TB): every operator shuffles at most twice and always
  * on `user_id` or a day-grain aggregate. The funnel is ONE shuffle —
  * stage timestamps are unbounded-frame partition constants, so the
  * Window operators cluster by user_id without any time-order sort, and
  * the cascade (signup → click → purchase) is three stacked projections
  * over the same exchange. Retention and rolling-actives aggregate to
  * (user × day) / (cohort × offset) grains that are many orders smaller
  * than the input; attribution and transitions are one window sort each.
  * Nothing here collects to the driver.
  */
object Behavior {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Epoch day of `ts` as bigint. FLOOR of a double division, not integer
    * DIV: DIV truncates toward zero, which disagrees with the oracle's
    * FLOOR (and with itself across the epoch) for pre-1970 timestamps.
    * Epoch seconds are far below 2^53, so the double math is exact. */
  private val dayCol =
    expr("CAST(FLOOR(unix_timestamp(ts) / 86400.0) AS BIGINT)")

  /** The DuckDB twin of [[dayCol]]. */
  private val daySql = "CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)"

  // ---- events_funnel: strict ordered 3-stage funnel ---------------------

  /** signup → click → purchase within 7 days of the user's FIRST signup,
    * stages strictly ordered. Stage anchors are conditional MINs over the
    * whole user partition (unbounded frames — the windows cluster by
    * user_id but never time-sort), each layer reusing the previous
    * layer's anchor, so the whole funnel is ONE exchange on user_id that
    * the three Window operators and the per-user distinct all reuse.
    * Output is the stage-count summary row. */
  private val funnel: Q = (s, dir) => funnelOf(ev(s, dir))

  private[graft] def funnelOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = events
      .withColumn("s1", min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("c1", min(when(col("event_type") === "click" &&
        col("ts") > col("s1") &&
        col("ts") <= col("s1") + expr("interval 7 days"), col("ts"))).over(w))
      .withColumn("p1", min(when(col("event_type") === "purchase" &&
        col("ts") > col("c1") &&
        col("ts") <= col("s1") + expr("interval 7 days"), col("ts"))).over(w))
      .select(col("user_id"), col("s1"), col("c1"), col("p1"))
      .distinct()
    staged.agg(
      count(col("s1")).as("n_signup"),
      count(col("c1")).as("n_click"),
      count(col("p1")).as("n_purchase"))
  }

  private val funnelOracle =
    """WITH s AS (
      |  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s1
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS c1
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s.s1 AND e.ts <= s.s1 + INTERVAL 7 DAY
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id
      |  FROM events e JOIN c ON e.user_id = c.user_id JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c1 AND e.ts <= s.s1 + INTERVAL 7 DAY
      |  GROUP BY e.user_id)
      |SELECT CAST((SELECT COUNT(s1) FROM s) AS BIGINT) AS n_signup,
      |       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
      |       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase""".stripMargin

  // ---- events_retention: cohort × day-offset matrix ---------------------

  /** Classic cohort retention: cohort = the user's first active epoch-day,
    * cell (cohort_day, day_offset) = distinct users from that cohort
    * active offset days later. The cohort day rides a per-user aggregate
    * window (r11; the r10 groupBy + join-back exchanged the events frame
    * twice — guide §2.4), then one (cohort, offset) count-distinct.
    * Per-user partitions are balanced (high-cardinality key). */
  private val retention: Q = (s, dir) => retentionOf(ev(s, dir))

  private[graft] def retentionOf(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), dayCol.as("day"))
    e.withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  private val retentionOracle =
    s"""WITH d AS (
      |  SELECT user_id, $daySql AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
      |SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
      |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
      |FROM d JOIN f ON d.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- events_attribution: last-touch channel for purchases -------------

  /** Last-touch attribution: each purchase credits the user's most recent
    * PRECEDING non-purchase event type; purchases with no prior touch
    * fall into 'none'. One window sort on (user_id; ts, event_id) — the
    * IGNORE NULLS running last_value is a linear pass, then a tiny
    * by-channel aggregate. */
  private val attribution: Q = (s, dir) => attributionOf(ev(s, dir))

  private[graft] def attributionOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("channel")
  }

  private val attributionOracle =
    """SELECT COALESCE(channel, 'none') AS channel,
      |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, value,
      |        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |          OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |      FROM events)
      |WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- events_transitions: next-event transition matrix -----------------

  /** Markov-style transition counts: (event_type → next event_type) per
    * user timeline, with the share of each source type's outgoing edges.
    * One window sort (lead), one small aggregate over a 5×5 key space;
    * the share is computed from a second tiny window over the aggregate,
    * not the raw events. */
  private val transitions: Q = (s, dir) => transitionsOf(ev(s, dir))

  private[graft] def transitionsOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val counts = events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("share",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("src")).cast("double"), 6))
      .orderBy("src", "dst")
  }

  private val transitionsOracle =
    """WITH pairs AS (
      |  SELECT event_type AS src,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst
      |  FROM events),
      |c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS share
      |FROM c ORDER BY src, dst""".stripMargin

  // ---- events_rolling_active: DAU + trailing-7-day WAU ------------------

  /** Per active day: distinct users that day (dau) and in the trailing
    * 7 days (wau7). Window count-DISTINCT doesn't exist in either engine,
    * so the standard scale shape is: dedup to the (user, day) grain
    * first (the big shrink), then explode each pair to the <=7 target
    * days it contributes to — amplification ×7 of an already-aggregated
    * frame, never of raw events. */
  private val rollingActive: Q = (s, dir) => rollingActiveOf(ev(s, dir))

  private[graft] def rollingActiveOf(events: DataFrame): DataFrame = {
    val pairs = events
      .select(dayCol.as("day"), col("user_id"))
      .distinct()
    // pairs is already distinct on (day, user_id) — plain count, no
    // second dedup aggregate
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = pairs
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    dau.join(wau, "day").orderBy("day")
  }

  private val rollingActiveOracle =
    s"""WITH pairs AS (
      |  SELECT DISTINCT $daySql AS day, user_id
      |  FROM events),
      |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      |        FROM pairs GROUP BY day),
      |wau AS (
      |  SELECT day + k AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
      |  FROM pairs CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS o(k)
      |  GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau7
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY dau.day""".stripMargin

  // ---- registration -----------------------------------------------------

  val queries: Map[String, Q] = Map(
    "events_funnel" -> funnel,
    "events_retention" -> retention,
    "events_attribution" -> attribution,
    "events_transitions" -> transitions,
    "events_rolling_active" -> rollingActive
  )

  val oracles: Map[String, String] = Map(
    "events_funnel" -> funnelOracle,
    "events_retention" -> retentionOracle,
    "events_attribution" -> attributionOracle,
    "events_transitions" -> transitionsOracle,
    "events_rolling_active" -> rollingActiveOracle
  )
}
