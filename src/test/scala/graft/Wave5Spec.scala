package graft

import org.apache.spark.sql.functions._
import graft.ops.Wave5

/** Wave-5 scoring operators: the semantic laws the DuckDB differential
  * gate cannot express (sketch mergeability; score values on a
  * hand-computed fixture; ntile stages partitioning the corpus). */
class Wave5Spec extends SparkSuite {

  test("unigram LM score matches the hand-computed distribution on a tiny corpus") {
    import spark.implicits._
    // counts: a=2, b=2, T=4 → ln(2/4) = -0.693147 for every token
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = Wave5.unigramLp(docs).orderBy("doc_id")
      .select("doc_id", "n_tok", "mean_lp")
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq === Seq((1L, 3L), (2L, 1L)))
    // doc 1: (2·-0.693147 + 1·-0.693147)/3 ; doc 2: -0.693147/1
    assert(math.abs(out(0)._3 - -0.693147) < 1e-9)
    assert(math.abs(out(1)._3 - -0.693147) < 1e-9)
  }

  test("unigram LM scores are log-probabilities: never positive, defined only for tokenized docs") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val scored = Wave5.unigramLp(docs).persist()
    assert(scored.filter(col("mean_lp") > 0).count() === 0)
    val tokenized = docs.filter(
      size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")) > 0).count()
    assert(scored.count() === tokenized)
    scored.unpersist()
  }

  test("curriculum stages partition each language's docs into 4 balanced bins") {
    val out = Wave5.queries("corpus_curriculum")(spark, sf).persist()
    assert(out.filter(col("stage") < 1 || col("stage") > 4).count() === 0)
    // ntile balance law: within a lang, bin sizes differ by at most 1
    val skew = out.groupBy("lang")
      .agg((max("n_docs") - min("n_docs")).as("spread"), count(lit(1)).as("bins"))
      .filter(col("spread") > 1 || col("bins") =!= 4)
    assert(skew.count() === 0)
    // stages partition the scored docs: totals agree with the score table
    val total = out.agg(sum("n_docs")).first().getLong(0)
    val scored = Wave5.unigramLp(
      graft.engine.Tables.load(spark, sf, "documents")).count()
    assert(total === scored)
    out.unpersist()
  }

  test("HLL sketches are mergeable: union of per-day sketches == one coarse sketch") {
    val ev = graft.engine.Tables.load(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
    val viaMerge = ev.groupBy("event_type", "d")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est2"))
    val diverged = viaMerge.join(direct, Seq("event_type"))
      .filter(col("est") =!= col("est2"))
    assert(diverged.count() === 0)
  }
}
