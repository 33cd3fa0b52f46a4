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

  test("column pruning: profiler melt reads only selected columns") {
    val p = graft.ops.Profiler.melt(spark, sf, graft.engine.Tables.meta("region"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"), p.take(800))
  }
}
