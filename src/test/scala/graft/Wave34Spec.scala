package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-34 semantics: the delta-join refresh converges to the full
  * recompute while touching only churn-sized deltas. */
class Wave34Spec extends SparkSuite {

  test("sink_ivm_join: incremental view equals the from-scratch join") {
    val vw = SparkEntry.queries("sink_ivm_join")(spark, sf)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(5)) === 0, lit("VIP"))
          .otherwise(col("c_mktsegment")).as("segment"))
    val full = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "o_orderpriority", "segment")
    assert(vw.count() === full.count())
    val diff = vw.unionByName(full).groupBy("o_orderkey", "o_custkey",
        "o_orderpriority", "segment")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 2)
    assert(diff.count() === 0, "incremental view diverged from recompute")
  }
}
