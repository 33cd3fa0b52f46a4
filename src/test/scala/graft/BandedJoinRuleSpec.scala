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

  test("guard band keeps float-boundary pairs the double predicate admits") {
    import spark.implicits._
    // abs(5.0 - (-1e-20)) rounds to exactly 5.0 in doubles, so the plain
    // theta join matches the pair — but the point's REAL band floor(-1e-20/5)
    // is -1, outside the interval's unwidened range [0, 2]. The ±1 guard
    // band must keep it. Also: a huge value whose x+c band saturates must
    // not crash the generated Sequence (overflow clamp).
    val interval = Seq((1L, 5.0), (2L, 1.5e308)).toDF("id", "x")
    val point = Seq(-1e-20, 3.0).toDF("y")
    def q() = interval.join(point, abs(col("x") - col("y")) <= 5.0)
      .select("id", "y").orderBy("id", "y")
    val baseline = q().collect()
    assert(baseline.length === 2, baseline.mkString(","))
    spark.conf.set("spark.graft.bandedRangeJoin", "true")
    try {
      assert(q().collect() === baseline)
      assert(!q().queryExecution.executedPlan.toString.contains("NestedLoopJoin"))
    } finally spark.conf.unset("spark.graft.bandedRangeJoin")
  }

  test("broadcast hint follows its side when orientation swaps the children") {
    import spark.implicits._
    val p = Seq((1L, 4.0), (2L, 100.0)).toDF("id", "value")
    val v = Seq(3.0, 98.0).toDF("pv")
    spark.conf.set("spark.graft.bandedRangeJoin", "true")
    try {
      // pv (the `a` side of abs(pv - value)) lives on the broadcast-hinted
      // right child; after the rewrite flips children the hint must still
      // broadcast v, not p
      val df = p.join(broadcast(v), abs(col("pv") - col("value")) <= 5.0)
        .orderBy("id", "pv")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin"), plan.take(600))
      assert(df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
        Seq((1L, 3.0), (2L, 98.0)))
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
