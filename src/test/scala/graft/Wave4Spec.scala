package graft

import org.apache.spark.sql.functions._
import graft.ops.Wave4

/** Wave-4 training-pipeline operators: semantic properties the DuckDB
  * differential gate cannot express (contamination is actually removed,
  * the shuffle is a permutation, chunks cover every token). */
class Wave4Spec extends SparkSuite {

  test("decontaminate removes exactly the docs sharing a 5-gram with the eval split") {
    import spark.implicits._
    val docs = Seq(
      // eval split (source = src0)
      (1L, "alpha beta gamma delta epsilon zeta", "en", "src0"),
      // train: contains the eval 5-gram "alpha beta gamma delta epsilon" → dropped
      (2L, "x alpha beta gamma delta epsilon y", "en", "src1"),
      // train: shares only a 4-gram ("beta gamma delta epsilon" then diverges) → kept
      (3L, "beta gamma delta epsilon QQQ zeta", "en", "src1"),
      // train: shorter than the shingle width → kept by construction
      (4L, "tiny doc", "en", "src2"),
      // train: no overlap at all → kept
      (5L, "one two three four five six seven", "en", "src2")
    ).toDF("doc_id", "text", "lang", "source")
    val kept = Wave4.testDecontaminate(docs).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L))
  }

  test("shuffle_global is a deterministic permutation with dense per-shard positions") {
    val out = Wave4.queries("shuffle_global")(spark, sf).persist()
    val n = graft.engine.Tables.load(spark, sf, "documents").count()
    // every doc appears exactly once
    assert(out.count() === n)
    assert(out.select("doc_id").distinct().count() === n)
    // positions are dense 1..count(shard) within every shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1 || col("d") =!= col("c"))
    assert(bad.count() === 0)
    // re-running produces the identical assignment (content-hash, no RNG)
    val again = Wave4.queries("shuffle_global")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("chunk_stride covers every token and respects the 64/48 geometry") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")).as("len"))
    val chunks = Wave4.queries("chunk_stride")(spark, sf)
    val per = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tok").as("tok_in_chunks"),
        max("n_tok").as("max_chunk"))
      .join(docs, "doc_id")
    // every chunk is at most 64 tokens; chunk count matches the formula;
    // total chunked tokens = len + 16-token overlap per extra chunk
    val bad = per.filter(
      col("max_chunk") > 64 ||
      col("n_chunks") =!= when(col("len") <= 64, 1)
        .otherwise(floor((col("len") - 17).cast("double") / 48.0).cast("int") + 1) ||
      col("tok_in_chunks") =!= col("len") + (col("n_chunks") - 1) * 16)
    assert(bad.count() === 0)
  }

  test("dedup_incremental verdicts: exact dup, near dup, and fresh doc") {
    import spark.implicits._
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // exact duplicate of doc 1 (case/whitespace-normalized)
      (10L, "  Alpha beta GAMMA delta epsilon zeta eta theta "),
      // near dup: 6-token prefix shared with doc 1 -> 4 of its 6 shingles
      // hit (containment 0.67 >= 0.5)
      (11L, "alpha beta gamma delta epsilon zeta QQQ RRR"),
      // fresh: no shingle overlap at all
      (12L, "nine ten eleven twelve thirteen fourteen")
    ).toDF("doc_id", "text")
    val out = Wave4.incrementalDedup(existing, incoming)
      .select("doc_id", "exact_dup", "kept")
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out(0) === ((10L, true, false)), s"exact dup must drop: ${out(0)}")
    assert(out(1) === ((11L, false, false)), s"near dup must drop via containment: ${out(1)}")
    assert(out(2) === ((12L, false, true)), s"fresh doc must be kept: ${out(2)}")
  }

  test("semdedup kept set is pairwise non-near within every cell") {
    // any near pair would have dropped its larger member, so the surviving
    // corpus must contain no within-cell pair at or above the threshold
    val kept = Wave4.queries("semdedup")(spark, sf)
    val e = graft.engine.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = kept.join(e, "vec_id")
    val nearKept = k.as("x").join(k.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(round(graft.functions.Native.cosineSim(
        col("x.embedding"), col("y.embedding")), 6) >= 0.3)
      .count()
    assert(nearKept === 0)
    // and it actually deduplicates: something was dropped
    assert(kept.count() < e.count())
  }

  test("text_tfidf: ubiquitous terms score zero, integer columns are exact") {
    val out = Wave4.queries("text_tfidf")(spark, sf).persist()
    val nDocs = graft.engine.Tables.load(spark, sf, "documents").count()
    // a term present in every document has idf = ln(1) = 0 (and no term
    // can exceed the corpus size)
    assert(out.filter(col("df") > nDocs).count() === 0)
    assert(out.filter(col("df") === nDocs && col("tfidf") =!= 0.0).count() === 0)
    // df is consistent: distinct docs per token in the output
    val badDf = out.groupBy("token")
      .agg(countDistinct("doc_id").as("docs"), max("df").as("df"), min("df").as("df2"))
      .filter(col("docs") =!= col("df") || col("df") =!= col("df2"))
    assert(badDf.count() === 0)
    out.unpersist()
  }
}
