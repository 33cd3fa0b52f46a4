package graft

import org.apache.spark.sql.functions._

/** The opt-in banded range-join rewrite (graft.plans.BandedRangeJoinRewrite):
  * an abs-range theta join plans as a hash equi-join on the band key with
  * byte-identical results, and the rule leaves non-matching joins alone. */
class BandedJoinRuleSpec extends SparkSuite {

  private def rangeJoin() = {
    val ev = graft.engine.Tables.load(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("value").as("pv"))
    p.join(v, abs(col("pv") - col("value")) <= 5.0)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .orderBy("event_id")
  }

  test("flag on: theta join becomes a hash equi-join, results unchanged") {
    val baseline = rangeJoin().collect()
    val plainPlan = rangeJoin().queryExecution.executedPlan.toString
    assert(plainPlan.contains("NestedLoopJoin"),
      s"without the rule a no-equi-key join must nested-loop:\n${plainPlan.take(500)}")
    spark.conf.set("spark.graft.bandedRangeJoin", "true")
    try {
      val df = rangeJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin"),
        s"rewrite must remove the nested loop:\n${plan.take(800)}")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected a hash/sort-merge equi-join on the band key:\n${plan.take(800)}")
      assert(df.collect() === baseline)
    } finally spark.conf.unset("spark.graft.bandedRangeJoin")
  }

  test("equi joins and non-abs thetas are untouched by the flag") {
    spark.conf.set("spark.graft.bandedRangeJoin", "true")
    try {
      val c = graft.engine.Tables.load(spark, sf, "customer")
      val o = graft.engine.Tables.load(spark, sf, "orders")
      val equi = c.join(o, col("c_custkey") === col("o_custkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      // one-sided range (no abs): out of scope, stays as-is
      val theta = c.join(o, col("o_custkey") <= col("c_custkey"))
      assert(!theta.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    } finally spark.conf.unset("spark.graft.bandedRangeJoin")
  }
}
