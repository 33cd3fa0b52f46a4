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
