package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Analytics

/** Analytics-wave operators: plan shapes (subqueries must become joins),
  * sampling mass, pivot mass conservation, gap-fill density. */
class AnalyticsSpec extends SparkSuite {

  test("subq_exists plans as a left-semi join, not a per-row probe") {
    val df = Analytics.queries("subq_exists")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join, got:\n$plan")
  }

  test("subq_not_in plans as an anti join") {
    val df = Analytics.queries("subq_not_in")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti join, got:\n$plan")
  }

  test("hash sample selects a stable ~10% mass, deterministically") {
    val total = Tables.load(spark, sf, "lineitem").count()
    val n1 = Analytics.queries("sample_hash")(spark, sf).count()
    val n2 = Analytics.queries("sample_hash")(spark, sf).count()
    assert(n1 === n2, "content-hash sampling is deterministic")
    val frac = n1.toDouble / total
    assert(frac > 0.06 && frac < 0.14, s"sample fraction $frac out of band")
  }

  test("pivot_wide conserves mass: F+O+P sums to the order count") {
    val total = Tables.load(spark, sf, "orders").count()
    val pivoted = Analytics.queries("pivot_wide")(spark, sf)
      .select((col("F") + col("O") + col("P")).as("rowsum"))
      .agg(sum("rowsum")).collect()(0).getLong(0)
    assert(pivoted === total)
  }

  test("timeseries_gapfill produces a dense per-user day spine") {
    val got = Analytics.queries("timeseries_gapfill")(spark, sf)
    val gaps = got.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"), count(lit(1)).as("n"))
      .filter(datediff(col("d1"), col("d0")) + 1 =!= col("n"))
      .count()
    assert(gaps === 0, "every user's spine must be gap-free")
    assert(got.filter(col("n") === 0).count() > 0, "zeros actually filled")
  }

  test("agg_corr_regr matches Spark's built-in corr within rounding") {
    val builtin = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Analytics.queries("agg_corr_regr")(spark, sf).collect().foreach { r =>
      val flag = r.getString(0)
      assert(math.abs(r.getDouble(2) - builtin(flag)) < 1e-6,
        s"corr($flag) diverges from builtin")
    }
  }
}
