package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-54 semantics: the PPJoin prefix filter is LOSSLESS — the
  * pruned join returns exactly the pairs an unpruned local all-pairs
  * scan finds; growth accounting satisfies the flow identities that
  * define it. */
class Wave54Spec extends SparkSuite {

  test("dedup_prefix_filter: pruned result == unpruned all-pairs (lossless)") {
    val rows = SparkEntry.queries("dedup_prefix_filter")(spark, sf).collect()
    // local unpruned all-pairs over the same token sets
    val sets = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0")
      .select(col("doc_id"),
        array_distinct(filter(split(lower(col("text")), "[^a-z0-9]+"),
          x => x =!= "")).as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .sortBy(_._1)
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (d1, t1) = sets(i); (d2, t2) = sets(j)
      inter = t1.intersect(t2).size
      union = t1.union(t2).size
      if union > 0 && inter * 2 >= union
    } yield (d1, d2, inter.toLong, union.toLong)).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(r.fieldIndex("shared")), r.getLong(r.fieldIndex("union_n")))).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(rows.nonEmpty, "fixture must produce at least one qualifying pair")
  }

  test("dedup_prefix_filter: prefix candidates are a strict subset of all pairs") {
    // the point of the filter: candidate generation examined FEWER pairs
    // than all-pairs would; verify via the prefix construction directly
    val docToks = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0")
      .select(col("doc_id"), explode(array_distinct(
        filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= ""))).as("w"))
    val nDocs = docToks.select("doc_id").distinct().count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val df = docToks.groupBy("w").agg(count(lit(1)).as("df"))
    val sizes = docToks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ranked = docToks.join(df, "w").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("w"))))
    val prefix = ranked.filter(col("rn") <= col("n") - expr("(n + 1) div 2") + 1)
    val candCount = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    assert(candCount < allPairs,
      s"prefix filter generated $candCount candidates vs $allPairs all-pairs")
  }

  test("events_growth_accounting: flow identities hold week over week") {
    val rows = SparkEntry.queries("events_growth_accounting")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.length > 1)
    // active = new + retained + resurrected, every week
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_active")) ===
        r.getLong(r.fieldIndex("n_new")) + r.getLong(r.fieldIndex("n_retained")) +
          r.getLong(r.fieldIndex("n_resurrected")),
        s"week ${r.getLong(0)}: active != new+retained+resurrected")
    }
    // churned(w) = active(w-1) - retained(w) for consecutive weeks
    rows.sliding(2).foreach { case Array(p, c) =>
      if (c.getLong(0) == p.getLong(0) + 1) {
        assert(c.getLong(c.fieldIndex("n_churned")) ===
          p.getLong(p.fieldIndex("n_active")) - c.getLong(c.fieldIndex("n_retained")))
      }
    }
    // first week: everyone is new
    val first = rows.head
    assert(first.getLong(first.fieldIndex("n_new")) ===
      first.getLong(first.fieldIndex("n_active")))
    // total new across all weeks = total distinct users
    val totalNew = rows.map(r => r.getLong(r.fieldIndex("n_new"))).sum
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(totalNew === users, "every user is new exactly once")
  }
}
