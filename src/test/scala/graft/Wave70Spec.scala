package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-70 semantics: keep-best preserves one survivor per cluster and
  * only richness-ranked ones; the version ledger matches the edit
  * script exactly. */
class Wave70Spec extends SparkSuite {

  test("dedup_keep_best: one survivor per cluster, richest wins") {
    val rows = SparkEntry.queries("dedup_keep_best")(spark, sf).collect()
    assert(rows.nonEmpty)
    val comp = SparkEntry.queries("dedup_components")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val rich = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(array_distinct(filter(split(lower(col("text")), "[^a-z0-9]+"),
          x => x =!= ""))).cast("long").as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = comp.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1) }
    val bestOf = clusters.map { case (c, ids) =>
      c -> ids.maxBy(id => (rich(id), -id))
    }
    val all = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val inCluster = comp.map(_._1).toSet
    val keptIds = all.map(_._1).filterNot(inCluster.contains).toSet ++
      bestOf.values.toSet
    val expected = all.filter(d => keptIds.contains(d._1)).groupBy(_._2)
      .map { case (src, ds) => src -> (ds.length.toLong, ds.map(_._1).sum) }
    val nChanged = clusters.count { case (c, ids) => bestOf(c) != ids.min }.toLong
    rows.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) === e._1, s"${r.getString(0)} count")
      assert(r.getLong(2) === e._2, s"${r.getString(0)} id sum")
      assert(r.getLong(3) === nChanged)
    }
    // the policy must actually differ somewhere on this fixture OR the
    // report says zero — either way the count is consistent (asserted
    // above); also every cluster has exactly one survivor
    assert(bestOf.size === clusters.size)
  }

  test("sink_version_diff: ledger matches the edit script") {
    val rows = SparkEntry.queries("sink_version_diff")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val n = Tables.load(spark, sf, "customer").count()
    val newKeys = Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") < 100).count()
    val ks = Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val allKeys = ks ++ ks.filter(_ < 100).map(_ + 1000000L)
    val exactDels = allKeys.count(_ % 10 == 7).toLong
    assert(rows(2L) === ((n, n + newKeys, newKeys)))
    assert(rows(3L) === ((n + newKeys, n + newKeys - exactDels, -exactDels)))
  }
}
