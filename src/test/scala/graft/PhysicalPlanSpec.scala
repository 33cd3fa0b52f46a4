package graft

import org.apache.spark.sql.functions._
import graft.ops.Physical

/** Physical-layout plan contracts: the bucketed join must consume the
  * stored clustering (no exchange on either side), and the partitioned
  * fact join must carry a runtime dynamic-partition-pruning filter on
  * its scan (the Wave6PlanSpec convention: assert on the executed AQE
  * plan). */
class PhysicalPlanSpec extends SparkSuite {

  test("co-bucketed join runs with ZERO exchanges: the write-time clustering is the shuffle") {
    val joined = Physical.bucketedJoin(spark, sf)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(2000))
    // the scans report the bucket selection (Bucketed scan branch)
    assert(plan.contains("SelectedBucketsCount"), plan.take(2000))
  }

  test("partitioned fact scan carries a dynamicpruning PartitionFilter from the dim join") {
    val joined = Physical.dppJoin(spark, sf)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("declarative row_number<=k gets a PARTIAL WindowGroupLimit below the exchange") {
    val df = SparkEntry.queries("win_topk_declarative")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the shuffle must carry at most k rows per (group x map partition):
    // Partial mode sits below the Exchange, Final above it
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert("WindowGroupLimit [^\\n]*Partial".r.findFirstIn(plan).isDefined, plan.take(2500))
    val idxPartial = plan.indexOf("Partial")
    val idxExchange = plan.indexOf("Exchange hashpartitioning")
    assert(idxExchange >= 0 && idxExchange < idxPartial,
      s"Partial limit must be BELOW the exchange\n${plan.take(2500)}")
  }

  test("DPP actually skips partitions: the pruned scan reads fewer rows than the fact") {
    val joined = Physical.dppJoin(spark, sf)
    val n = joined.count()
    val all = graft.engine.Tables.load(spark, sf, "events").count()
    // engagement = click + view: a strict subset of the five types
    assert(n > 0 && n < all, s"joined=$n all=$all")
    val types = joined.select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(types.toSeq === Seq("click", "view"))
  }
}
