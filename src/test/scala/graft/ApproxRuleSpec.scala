package graft

import org.apache.spark.sql.functions._

/** The opt-in approximation mode (graft.plans.ApproxDistinctRewrite):
  * count(DISTINCT x) lowers to HLL++ under the flag, stays exact
  * without it, and non-eligible distinct aggregates are untouched. */
class ApproxRuleSpec extends SparkSuite {

  private def ndvQuery() =
    graft.engine.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("ndv"))

  test("flag off: exact distinct count, no sketch in the plan") {
    val df = ndvQuery()
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("approx_count_distinct"), plan.take(400))
    // exact equals a manual distinct-then-count
    val exact = graft.engine.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("ndv"))
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("flag on: count(DISTINCT) lowers to HLL++ and lands within 5% of exact") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = ndvQuery()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("approx_count_distinct"),
        s"expected the rewrite to inject approx_count_distinct:\n${plan.take(600)}")
      val exact = graft.engine.Tables.load(spark, sf, "lineitem")
        .select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("ndv"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      df.collect().foreach { r =>
        val (k, approx) = (r.getString(0), r.getLong(1))
        val e = exact(k).toDouble
        assert(math.abs(approx - e) / e <= 0.05,
          s"group $k: approx $approx vs exact $e beyond 5%")
      }
    } finally spark.conf.unset("spark.graft.approxDistinct")
  }

  test("multi-column and non-count distincts keep exact semantics under the flag") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val multi = graft.engine.Tables.load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("ndv2"))
      assert(!multi.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("approx_count_distinct"))
      val sumD = graft.engine.Tables.load(spark, sf, "lineitem")
        .agg(sum_distinct(col("l_linenumber")).as("sd"))
      assert(!sumD.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("approx_count_distinct"))
    } finally spark.conf.unset("spark.graft.approxDistinct")
  }
}
