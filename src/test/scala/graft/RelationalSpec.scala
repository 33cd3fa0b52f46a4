package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Sanity + property coverage for the relational surface. Deep correctness
  * lives in the DuckDB oracle (tools/check.py); these assert engine-side
  * invariants the oracle can't see. */
class RelationalSpec extends SparkSuite {

  test("every declared oracle has a query and every query runs at sf0.001") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    for ((name, fn) <- qs) {
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("entry returns non-empty profile") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("union-distinct is idempotent") {
    val a = Relational.queries("setop_union_distinct")(spark, sf)
    assert(a.distinct().count() === a.count())
  }

  test("topk_global returns exactly k rows ordered descending") {
    val rows = Relational.queries("topk_global")(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    assert(rows.length === 100)
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b })
  }

  test("broadcast join plan actually broadcasts the dimension") {
    val joinPlan = graft.ops.Joins.queries("join_broadcast_equi")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("BroadcastHashJoin"), joinPlan.take(500))
  }

  test("shuffle-hash join hint is honored") {
    val p = graft.ops.Joins.queries("join_shuffle_hash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.take(500))
  }

  test("filter pushdown reaches the parquet scan") {
    val p = Relational.queries("filter_eq_lookup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]"),
      p.take(800))
  }

  test("banded range join plans as an equi hash join, never nested-loop") {
    // the declared query materializes inside the codegen scope (its own
    // plan is the checkpoint scan), so the contract inspects the inner
    // lazy plan the scope executes
    val df = graft.ops.Joins.joinRangeBandedInner(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"),
      s"banded rewrite must not fall back to a nested-loop join:\n${p.take(800)}")
    assert(p.contains("HashJoin"), s"expected a hash equi-join on the band key:\n${p.take(800)}")
  }

  test("interval-point join plans as an equi hash join, never nested-loop") {
    val df = graft.ops.Joins.queries("join_interval_point")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"),
      s"interval splitting must not fall back to a nested-loop join:\n${p.take(800)}")
    assert(p.contains("HashJoin"), s"expected a hash equi-join on the band key:\n${p.take(800)}")
  }

  test("approx_percentile sketch lands within its rank-error bound of exact") {
    import org.apache.spark.sql.functions._
    // accuracy=1000 → rank error ≤ n/1000; assert the approx value sits
    // between the exact quantiles one generous rank-error band away
    val approx = Relational.queries("agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bounds = graft.engine.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.49)").as("p50lo"),
        expr("percentile(l_quantity, 0.51)").as("p50hi"),
        expr("percentile(l_quantity, 0.89)").as("p90lo"),
        expr("percentile(l_quantity, 0.91)").as("p90hi"))
      .collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      val (m, p90) = approx(r.getString(0))
      assert(m >= r.getDouble(1) && m <= r.getDouble(2),
        s"${r.getString(0)}: approx median $m outside [${r.getDouble(1)}, ${r.getDouble(2)}]")
      assert(p90 >= r.getDouble(3) && p90 <= r.getDouble(4),
        s"${r.getString(0)}: approx p90 $p90 outside [${r.getDouble(3)}, ${r.getDouble(4)}]")
    }
  }

  test("column pruning: profiler melt reads only selected columns") {
    val p = graft.ops.Profiler.melt(spark, sf, graft.engine.Tables.meta("region"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"), p.take(800))
  }
}
