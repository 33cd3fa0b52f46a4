package graft

import org.apache.spark.sql.functions._
import graft.ops.Behavior

/** Behavioral-analytics semantics the differential gate can't isolate:
  * funnel stage ordering and the 7-day cutoff, attribution's 'none'
  * bucket, and the trailing-7-day window edges of rolling actives. */
class BehaviorSpec extends SparkSuite {

  private def ev(rows: (Long, String, Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
  }

  test("funnel: stages must be strictly ordered and inside 7 days of first signup") {
    // u1: full ordered funnel. u2: click BEFORE signup (doesn't count), no
    // qualifying click -> stalls at signup. u3: click qualifies but the
    // purchase lands day 8 after signup -> outside the window. u4: never
    // signs up -> contributes to no stage.
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "click", 0.0),
      (3L, "2024-01-03 10:00:00", 1L, "purchase", 5.0),
      (4L, "2024-01-01 09:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 10:00:00", 2L, "signup", 0.0),
      (6L, "2024-01-01 10:00:00", 3L, "signup", 0.0),
      (7L, "2024-01-02 10:00:00", 3L, "click", 0.0),
      (8L, "2024-01-09 10:00:01", 3L, "purchase", 9.0),
      (9L, "2024-01-01 10:00:00", 4L, "click", 0.0))
    val r = Behavior.funnelOf(e).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
  }

  test("attribution: purchase credits most recent prior touch; bare purchase -> none") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:10:00", 1L, "purchase", 10.0),
      // consecutive purchases both credit the same last click
      (4L, "2024-01-01 10:11:00", 1L, "purchase", 2.5),
      // u2's first event is a purchase: no prior touch
      (5L, "2024-01-01 09:00:00", 2L, "purchase", 7.0))
    val r = Behavior.attributionOf(e).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(r === Seq(("click", 2L, 12.5), ("none", 1L, 7.0)))
  }

  test("rolling actives: wau7 counts a user active exactly 6 days earlier, not 7") {
    val e = ev(
      (1L, "2024-01-01 12:00:00", 1L, "view", 0.0), // day d
      (2L, "2024-01-07 12:00:00", 2L, "view", 0.0), // day d+6: u1 still in window
      (3L, "2024-01-08 12:00:00", 3L, "view", 0.0)) // day d+7: u1 aged out
    val r = Behavior.rollingActiveOf(e).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val d = r.head._1
    assert(r === Seq((d, 1L, 1L), (d + 6, 1L, 2L), (d + 7, 1L, 2L)))
  }

  test("funnel plan: one exchange, no window sort (unbounded-frame cascade)") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "click", 0.0))
    val staged = Behavior.funnelOf(e)
    staged.collect()
    val full = staged.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan's toString appends the pre-AQE "Initial Plan";
    // assert on the final plan section only
    val plan = full.split("== Initial Plan ==").head
    // one exchange partitions by user_id and is reused by all three
    // stacked Window operators AND the per-user distinct (back-to-back
    // HashAggregates, no re-exchange); the final single-row agg adds only
    // a SinglePartition exchange
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges === 1, s"expected 1 user_id exchange:\n${plan.take(2000)}")
    // the Windows cluster by user_id only — no (ts, event_id) time-order
    // sort anywhere (unbounded frames need none)
    assert(!"Sort \\[[^\\]]*ts#".r.findFirstIn(plan).isDefined,
      s"unbounded-frame windows must not time-sort:\n${plan.take(2000)}")
  }

  test("retention: day_offset 0 holds every user once; transitions shares sum to 1 per src") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "click", 0.0),
      (3L, "2024-01-02 11:00:00", 1L, "view", 0.0),
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0))
    val ret = Behavior.retentionOf(e).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val d0 = ret.head._1
    assert(ret === Seq((d0, 0L, 2L), (d0, 1L, 1L)))
    val tr = Behavior.transitionsOf(e)
    val bySrc = tr.groupBy("src").agg(round(sum("share"), 6).as("s"))
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(bySrc.values.forall(_ === 1.0), bySrc.toString)
    // u1's path view -> click -> view; u2 has no next event
    val edges = tr.collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(edges === Map(("view", "click") -> 1L, ("click", "view") -> 1L))
  }
}
