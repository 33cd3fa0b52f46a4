package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's ONE portable hash core: a 60-bit (15-hex-digit) integer
  * view of md5, shared by every sampling / sharding / split / minhash
  * operator. Consolidated here because the expression is
  * determinism-critical — a drift in any hand-copied instance
  * (substring width, base, pmod vs %) would silently change sample
  * membership — and because the DuckDB oracles mirror it verbatim:
  *
  *   CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)       -- md5Long
  *   ... % N                                                    -- bucket
  *
  * 15 hex digits keep the value inside a signed 64-bit range (60 bits),
  * so the Spark `conv(..., 16, 10)` and the DuckDB 0x-literal cast agree
  * exactly; pmod == % on the non-negative result.
  */
object Hashing {

  /** 60-bit integer of md5 over binary input. */
  def md5Long(bin: Column): Column =
    conv(substring(md5(bin), 1, 15), 16, 10).cast("bigint")

  /** Same, over an already-computed md5 hex-string column (for callers
    * that also carry the hex digest itself, e.g. shuffle_global's
    * order key). */
  def md5HexLong(hexCol: Column): Column =
    conv(substring(hexCol, 1, 15), 16, 10).cast("bigint")

  /** Uniform residue bucket in [0, mod). */
  def md5Bucket(bin: Column, mod: Int): Column =
    pmod(md5Long(bin), lit(mod))

  /** THE content-hash train/val/test assignment (98/1/1 over the text's
    * md5 residue) — single definition shared by corpus_split and
    * split_leakage so the audited partition can never drift from the
    * produced one. */
  def splitOf(text: Column): Column = {
    val bucket = md5Bucket(text.cast("binary"), 100)
    when(bucket <= 97, "train").when(bucket === 98, "val").otherwise("test")
  }

  /** DuckDB twin of [[splitOf]], shared by the same two oracles. */
  val duckSplitCase: String =
    """CASE WHEN CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 <= 97 THEN 'train'
      |         WHEN CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 = 98 THEN 'val'
      |         ELSE 'test' END""".stripMargin
}
