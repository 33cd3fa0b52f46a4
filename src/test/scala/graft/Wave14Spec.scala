package graft

import org.apache.spark.sql.functions._

/** Wave-14 semantics: FD verdicts match ground truth on declared keys,
  * and the packing budget conserves the corpus token mass. */
class Wave14Spec extends SparkSuite {

  test("profile_fd: declared keys hold, known denormalization violations fail") {
    val rows = SparkEntry.queries("profile_fd")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(r.fieldIndex("holds")))).toSeq
    def verdict(tbl: String, lhs: String) =
      rows.collectFirst { case (t, l, _, h) if t == tbl && l == lhs => h }.get
    assert(verdict("nation", "n_nationkey"), "primary key must determine any column")
    assert(verdict("customer", "c_custkey"))
    assert(verdict("orders", "o_orderkey"))
    assert(verdict("part", "p_partkey"))
    assert(!verdict("part", "p_brand"), "a brand spans many part types")
    assert(!verdict("nation", "n_regionkey"), "region has many nations")
    assert(!verdict("customer", "c_nationkey"), "nation has many segments")
  }

  test("corpus_pack_efficiency conserves the corpus token mass per stream") {
    import graft.engine.Tables
    val eff = SparkEntry.queries("corpus_pack_efficiency")(spark, sf)
    val effTotal = eff.agg(sum("tok_total")).head.getLong(0)
    val corpusTotal = Tables.load(spark, sf, "documents")
      .select(size(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => x =!= "")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(effTotal === corpusTotal)
    // a pack is either padded or overflowing, never both
    val bad = eff.filter(col("pad_total") < 0 || col("overflow_total") < 0).count()
    assert(bad === 0L)
  }
}
