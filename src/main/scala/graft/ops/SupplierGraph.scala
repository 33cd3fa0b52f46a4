package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The shared-customer supplier graph — ONE materialization feeding
  * every graph read (node Jaccard, modularity, assortativity): the
  * distinct customer↔supplier edge list and the weighted supplier
  * pair list (pairs generated through the shared customer, cost
  * Σ degree² — never an all-pairs supplier join). Materialized per
  * (session, dir) exactly like the dedup pair tables: the expensive
  * pair join runs once per session no matter how many graph queries
  * read it. */
object SupplierGraph {

  /** Distinct (customer, supplier) purchase edges. */
  def edges(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize(s, s"supplier-edges:$dir") {
      Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
        .distinct()
    }

  /** Supplier pairs weighted by shared-customer count: (p1 < p2, w). */
  def pairWeights(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize(s, s"supplier-pairs:$dir") {
      val e = edges(s, dir)
      e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
        .agg(count(lit(1)).as("w"))
    }
}
