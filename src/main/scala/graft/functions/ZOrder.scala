package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key, the engine's replacement for the
  * reference's Delta `OPTIMIZE … ZORDER BY` clustering (ref: dbc
  * cmd16/cmd17; SURVEY.md §4.1). Built purely from composable `Column`
  * bit-ops so it stays inside whole-stage codegen — no UDF, no custom
  * Expression needed (SURVEY.md §4.3).
  *
  * Each input column is rank-normalized by the caller (or used raw when
  * already dense ints), truncated to `bits` bits, and bit-interleaved.
  * Clustering = `repartitionByRange(zvalue)` + `sortWithinPartitions`
  * + parquet write: range partitioning gives balanced files, the sort
  * gives per-file min/max locality on every interleaved dimension, and
  * parquet row-group stats then provide the data skipping that Delta
  * gets from its file-level stats.
  */
object ZOrder {

  /** Order-preserving numeric image of a column: numerics pass through,
    * strings map to their first-4-bytes big-endian value. Pure
    * expressions — no window, no shuffle, survives any scale. */
  def numericImage(df: org.apache.spark.sql.DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        // hex of the utf8 prefix, fixed width → order-preserving bigint
        conv(rpad(hex(substring(col(c), 1, 4)), 8, "0"), 16, 10).cast("bigint").cast("double")
      case _ => col(c).cast("double")
    }

  /** Cluster `df` along the Z-curve of `zorderBy`: min-max-normalize each
    * column's order-preserving numeric image to [0, 2^bits) (one tiny
    * agg job for the min/max), interleave into one z-value,
    * range-partition into `targetFiles` output partitions and sort
    * within each — every output file then covers a compact Z-curve
    * segment, so per-file min/max stats (parquet row groups AND the
    * manifest store's file stats) skip on EVERY clustered dimension.
    * (Delta's OPTIMIZE uses per-column range-partition ids instead —
    * better under skew; same plan shape, sampling instead of min/max.) */
  def cluster(df: org.apache.spark.sql.DataFrame, zorderBy: Seq[String],
      bits: Int, targetFiles: Int): org.apache.spark.sql.DataFrame = {
    val imgCols = zorderBy.map(c => numericImage(df, c))
    val aggs = imgCols.zipWithIndex.flatMap { case (ic, i) =>
      Seq(min(ic).as(s"mn$i"), max(ic).as(s"mx$i")) }
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val normCols = zorderBy.indices.map(i => s"__z$i")
    var tmp = df
    for (i <- zorderBy.indices) {
      // all-NULL clustering column -> neutral constant 0 bucket
      val (mn, mx) = if (mm.isNullAt(2 * i)) (0.0, 0.0)
        else (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
      val span = if (mx > mn) mx - mn else 1.0
      tmp = tmp.withColumn(normCols(i),
        ((imgCols(i) - mn) / span * ((1 << bits) - 1)).cast("bigint"))
    }
    tmp.withColumn("__zval", Native.zvalue(bits, normCols.map(col): _*))
      .repartitionByRange(math.max(1, targetFiles), col("__zval"))
      .sortWithinPartitions("__zval")
      .drop((normCols :+ "__zval").toIndexedSeq: _*)
  }

  /** Interleave the low `bits` bits of each column into one BIGINT
    * z-value. Column i contributes bit b to output position
    * `b * n + (n - 1 - i)`. */
  def zvalue(bits: Int, cols: Column*): Column = {
    val n = cols.size
    require(n * bits <= 62, s"z-value overflow: $n cols x $bits bits")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("bigint"), b).bitwiseAND(lit(1L)), b * n + (n - 1 - i))
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB-dialect twin of [[zvalue]] for oracle generation — same bit
    * arithmetic, textual form. */
  def zvalueSql(bits: Int, cols: String*): String = {
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * n + (n - 1 - i)})"
    terms.mkString("(", " | ", ")")
  }
}
