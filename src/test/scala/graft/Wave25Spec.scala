package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-25 semantics: filtered ANN respects the predicate and recovers
  * recall vs the filtered brute force; autocorrelation is bounded and
  * self-consistent; the manifest checksum is order-independent and
  * drift-sensitive. */
class Wave25Spec extends SparkSuite {

  test("sim_ann_filtered: only label-3 vectors, recall >= 6/10 vs filtered brute force") {
    val ann = SparkEntry.queries("sim_ann_filtered")(spark, sf)
      .collect().map(_.getLong(0))
    assert(ann.nonEmpty)
    val e = Tables.load(spark, sf, "embeddings")
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ann.foreach(id => assert(labels(id) === 3, s"vec $id not label 3"))
    val brute = {
      val f = e.filter(col("label") === 3 && col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding").as("v"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      f.crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.functions.Native.cosineSim(col("v"), col("qv")).as("cos"))
        .orderBy(desc("cos"), asc("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    val recall = ann.count(brute.contains)
    assert(recall >= 6, s"filtered ANN recall $recall/10 too low")
  }

  test("profile_autocorr: r_k in [-1,1], lag-0 identity holds on the deviations") {
    val rows = SparkEntry.queries("profile_autocorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(r.fieldIndex("r"))
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"r=$v out of range")
      assert(r.getLong(r.fieldIndex("n_pairs")) > 0)
    }
    // every (type, k) pair 1..7 present for a 30-day fixture
    assert(rows.length === rows.map(r => (r.getString(0), r.getLong(1))).distinct.length)
  }

  test("corpus_manifest: checksum is order-independent and flips on any content drift") {
    val base = SparkEntry.queries("corpus_manifest")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(r.fieldIndex("content_sum"))))
      .toMap
    assert(base.nonEmpty)
    assert(base.values.map(_._1).sum === Tables.load(spark, sf, "documents").count())
    // replaying over a shuffled frame reproduces the checksums exactly
    val shuffled = Tables.load(spark, sf, "documents").orderBy(rand(42))
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val again = shuffled
      .select(col("doc_id"), col("n_chars"),
        pmod(graft.ops.Hashing.md5HexLong(h), lit(8)).as("shard"),
        graft.ops.Hashing.md5Long(col("text").cast("binary")).as("chash"))
      .groupBy("shard")
      .agg(sum(col("chash").cast("decimal(38,0)")).cast("decimal(38,0)")
        .cast("string").as("cs"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    base.foreach { case (shard, (_, cs)) => assert(again(shard) === cs) }
    // a single-document mutation flips its shard's checksum
    val mutated = Tables.load(spark, sf, "documents")
      .withColumn("text",
        when(col("doc_id") === 7, concat(col("text"), lit("x")))
          .otherwise(col("text")))
      .select(col("doc_id"),
        pmod(graft.ops.Hashing.md5HexLong(h), lit(8)).as("shard"),
        graft.ops.Hashing.md5Long(col("text").cast("binary")).as("chash"))
      .groupBy("shard")
      .agg(sum(col("chash").cast("decimal(38,0)")).cast("decimal(38,0)")
        .cast("string").as("cs"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val shard7 = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 7)
      .select(pmod(graft.ops.Hashing.md5HexLong(h), lit(8)))
      .head.getLong(0)
    assert(mutated(shard7) !== base(shard7)._2)
    base.keys.filter(_ != shard7).foreach(sh => assert(mutated(sh) === base(sh)._2))
  }
}
