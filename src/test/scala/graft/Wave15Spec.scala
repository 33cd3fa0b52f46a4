package graft

/** Wave-15 semantics: contamination is monotone in the n-gram size —
  * every doc a long-shingle policy removes, every shorter policy also
  * removes (sub-n-grams of a shared n-gram are shared). */
class Wave15Spec extends SparkSuite {

  test("eval_decontaminate: hits shrink (weakly) as n grows; n=5 matches decontaminate") {
    val rows = SparkEntry.queries("eval_decontaminate")(spark, sf)
      .orderBy("n").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(3, 5, 8))
    val hits = rows.map(r => r.getLong(r.fieldIndex("n_hit_docs")))
    assert(hits(0) >= hits(1) && hits(1) >= hits(2), hits.mkString(","))
    // cross-check the shipped n=5 policy: survivors + hits = train docs
    val d = graft.engine.Tables.load(spark, sf, "documents")
    val trainDocs = d.filter(org.apache.spark.sql.functions.col("source") =!= "src0").count()
    val survivors = SparkEntry.queries("decontaminate")(spark, sf).count()
    assert(survivors + hits(1) === trainDocs)
  }
}
