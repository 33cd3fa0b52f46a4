package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions for the wave-6 operators — the scale
  * claims each query's doc comment makes, pinned against the executed
  * plan (the BehaviorSpec convention: assert on the final AQE plan). */
class Wave6PlanSpec extends SparkSuite {

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("profile_corr_matrix is ONE aggregation pass: a single global exchange, no joins, no windows") {
    val plan = planOf("profile_corr_matrix")
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    assert("Exchange SinglePartition".r.findAllIn(plan).length === 1, plan.take(1500))
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(1500))
  }

  test("timeseries_resample needs no window: one keyed exchange, struct min/max in the aggregate") {
    val plan = planOf("timeseries_resample")
    assert(!plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan.take(1500))
  }

  test("join_fuzzy blocks inside a BROADCAST loop over the model-sized dictionary") {
    val plan = planOf("join_fuzzy")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      plan.take(1500))
  }

  test("sample_balanced never serializes onto one task: no SinglePartition exchange anywhere") {
    val plan = planOf("sample_balanced")
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
    // the rank window is (range-partition, group)-keyed, never global:
    // its partition spec leads with the physical partition id
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
  }

  test("chunk_sentences reuses the doc_id exchange: two keyed shuffles end to end") {
    val plan = planOf("chunk_sentences")
    // pieces aggregate + doc window; the final chunk aggregate rides the
    // window's doc_id partitioning without a third exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2, plan.take(2000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("dedup_embed_cosine candidates join on the LSH cell — never label-only all-pairs") {
    val plan = planOf("dedup_embed_cosine")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the candidate self-join is keyed by the sign-LSH cell: its join
    // keys (broadcast or shuffled) must include the bucket column
    assert("Join [^\\n]*bucket".r.findFirstIn(plan).isDefined, plan.take(2000))
  }

  test("text_textrank supersteps are broadcast joins of the rank vector — the edge list never reshuffles") {
    // the r10 form pins the converged rank INSIDE the AQE-off loop
    // scope, so the returned plan is a read of the pinned frame; the
    // superstep contract (broadcast rank joins, no reshuffle of the
    // edge list) is asserted on the LOOP BODY's plan — one un-pinned
    // iteration rebuilt exactly as the query builds it
    val plan = planOf("text_textrank")
    assert(plan.contains("Scan ExistingRDD"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
    import spark.implicits._
    val ew = Seq(("a", "b", 2L, 4L), ("b", "a", 2L, 4L))
      .toDF("src", "dst", "w", "wt").localCheckpoint()
    val rank = Seq(("a", 0.5), ("b", 0.5)).toDF("token", "r")
    val step = ew.join(broadcast(rank), ew("src") === rank("token"))
      .groupBy(col("dst"))
      .agg(sum(round(col("r") * col("w") / col("wt"), 9)
        .cast(org.apache.spark.sql.types.DecimalType(20, 9))).as("m"))
    val stepPlan = step.queryExecution.executedPlan.toString
    assert(stepPlan.contains("BroadcastHashJoin"), stepPlan.take(1500))
    assert(!stepPlan.contains("SortMergeJoin"), stepPlan.take(1500))
  }
}
