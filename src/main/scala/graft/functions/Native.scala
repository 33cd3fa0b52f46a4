package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx.GraftNative

/** Public Column API over the engine's native Catalyst expressions
  * (implementations in org.apache.spark.sql.graftx — they need the
  * private[sql] catalyst surface; SURVEY.md §4.3). */
object Native {
  /** Fused-loop cosine similarity over two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column = GraftNative.cosineSim(a, b)

  /** Fused-loop dot product over two array<float> columns. */
  def dotF(a: Column, b: Column): Column = GraftNative.dotF(a, b)

  /** Morton interleave of the low `bits` bits of each column. */
  def zvalue(bits: Int, cols: Column*): Column = GraftNative.zvalue(bits, cols: _*)

  /** One-pass 64-bit SimHash aggregate over a hash column. */
  def simhashAgg(h: Column): Column = GraftNative.simhashAgg(h)

  /** Element-wise sum of array<float> vectors (centroid substrate). */
  def vecSumAgg(v: Column): Column = GraftNative.vecSumAgg(v)

  /** Multi-table hyperplane-LSH bucket array (one fused pass per row). */
  def lshBuckets(v: Column, planes: Int, tables: Int): Column =
    GraftNative.lshBuckets(v, planes, tables)

  /** Per-subspace PQ code: fused argmin-L2 over a codebook object. */
  def pqCode(v: Column, codebook: Array[Array[Float]]): Column =
    GraftNative.pqCode(v, codebook)

  /** Bounded top-k (value, count) aggregate, best-first. */
  def topKCountAgg(value: Column, cnt: Column, k: Int): Column =
    GraftNative.topKCountAgg(value, cnt, k)
}
