package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-48 semantics: the k-core is a fixpoint (every member keeps
  * degree ≥ k inside the core) and matches a local peel; running
  * distinct counts tie out against per-day exact distincts. */
class Wave48Spec extends SparkSuite {

  test("graph_kcore: fixpoint degrees >= k; matches local peeling") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(2) >= 10L,
      s"${r.getString(0)} ${r.getLong(1)}: degree ${r.getLong(2)} < k"))
    // local peel to convergence
    var edges = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val cd = edges.groupBy(_._1).map { case (k2, v) => k2 -> v.size }
      val pd = edges.groupBy(_._2).map { case (k2, v) => k2 -> v.size }
      val next = edges.filter { case (c, p) => cd(c) >= 10 && pd(p) >= 10 }
      changed = next.size != edges.size
      edges = next
    }
    val wantC = edges.groupBy(_._1).map { case (k2, v) => k2 -> v.size.toLong }
    val wantP = edges.groupBy(_._2).map { case (k2, v) => k2 -> v.size.toLong }
    val gotC = rows.filter(_.getString(0) == "customer")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val gotP = rows.filter(_.getString(0) == "supplier")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(gotC === wantC, "customer core mismatch")
    assert(gotP === wantP, "supplier core mismatch")
  }

  test("win_running_distinct: final cumulative equals exact distinct") {
    val rows = SparkEntry.queries("win_running_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    val finalCum = rows.groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.maxBy(_.getLong(1)).getLong(3) }
    val want = Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finalCum === want)
    // monotone non-decreasing within each type
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }
}
