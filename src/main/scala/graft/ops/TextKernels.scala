package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Shared text-model kernels, materialized once per (session, dir) —
  * the SupplierGraph/BrandGraph precedent applied to the n-gram
  * family: the corpus bigram count table feeds text_bigrams,
  * text_bigram_lp's model side and text_kneser_ney, so the data-sized
  * tokenize+explode+aggregate pass runs once no matter how many LM
  * readers follow. */
object TextKernels {

  /** Corpus bigram counts (w1, w2, c12) over the shared tokenizer. */
  def bigramCounts(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize(s, s"bigram-counts:$dir") {
      Wave7.bigramPairs(Tables.load(s, dir, "documents"))
        .groupBy(col("prev").as("w1"), col("tok").as("w2"))
        .agg(count(lit(1)).as("c12"))
    }
}
