package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Lakehouse table-maintenance seam (SURVEY.md §3.4, §7.3; design
  * follows "Delta Lake: High-Performance ACID Table Storage over Cloud
  * Object Stores", VLDB 2020 — PAPERS.md).
  *
  * The reference's storage layer is Delta (MERGE / OPTIMIZE / ZORDER /
  * auto-optimized writes — dbc cmd2, cmd13-17). This environment ships no
  * Delta jars, so the v1 implementation is parquet: overwrite writes,
  * upsert-as-join, compaction by target file size, and Z-order clustering
  * via range repartition on an interleaved-bits key. The trait isolates
  * exactly the operations OSS Delta would slot into.
  */
trait TableStore {
  def read(spark: SparkSession, name: String): DataFrame
  def overwrite(df: DataFrame, name: String): Unit
  /** Keyed upsert: source wins on key match, union otherwise (MERGE
    * WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *). */
  def upsert(spark: SparkSession, name: String, source: DataFrame, keys: Seq[String]): Unit
  /** Bin-pack to ~targetBytes files (ref: delta.optimize.maxfilesize,
    * dbc cmd2). */
  def compact(spark: SparkSession, name: String, targetBytes: Long): OptimizeMetrics
  /** Multi-dimensional clustering (ref: OPTIMIZE ZORDER, dbc cmd16/17). */
  def cluster(spark: SparkSession, name: String, zorderBy: Seq[String], bits: Int): OptimizeMetrics
  /** VACUUM analog: reclaim staging leftovers older than the retention
    * horizon (Delta's VACUUM default is 7 days; crash-abandoned staged
    * writes are the parquet store's only orphan class). Returns the number
    * of reclaimed directories. */
  def vacuum(retainMs: Long): Long
}

/** Shape-parity with the reference's OPTIMIZE result metrics struct
  * (SURVEY.md Appendix B.3). */
case class FileStats(num: Long, size: Long)
case class OptimizeMetrics(numFilesAdded: Long, numFilesRemoved: Long,
    filesAdded: FileStats, filesRemoved: FileStats, strategyName: String)

/** Shared filesystem helpers. */
object Fs {
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRec)
    f.delete(); ()
  }

  private val scratchRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Per-INVOCATION scratch root under this application's swept scratch
    * dir (GraftSession.manageScratch cleans the parent). Side-effecting
    * queries build a FRESH store here each run: reusing a fixed root
    * accumulates versions across invocations (Bench runs every query
    * twice per JVM), so re-runs pay ever-longer manifest chains and any
    * query whose result mentions history would drift from its oracle. */
  def freshScratch(s: org.apache.spark.sql.SparkSession, sub: String): String =
    sys.props("java.io.tmpdir") +
      s"/graft-scratch-${s.sparkContext.applicationId}/$sub-${scratchRuns.incrementAndGet()}"
}

/** The MERGE kernel shared by the store and the query surface: full-outer
  * equi-join on the key + row-wise source-wins projection. True
  * `WHEN MATCHED UPDATE SET *` semantics — a matched source row replaces
  * the target row ENTIRELY, including NULLing columns the source has as
  * NULL (a per-column coalesce would silently keep stale target values).
  * Keys match with plain equality, mirroring `MERGE ON t.k = s.k`: a NULL
  * source key never matches a NULL target key and inserts a new row
  * (pinned by StoreSpec's NULL-key test). */
object Merge {
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val t = target.withColumn("__t_exists", lit(true))
    val srf = source.withColumn("__s_exists", lit(true))
    val cond = keys.map(k => t(k) === srf(k)).reduce(_ && _)
    val cols = target.columns.map { c =>
      when(srf("__s_exists").isNotNull, srf(c)).otherwise(t(c)).as(c)
    }
    t.join(srf, cond, "full_outer").select(cols.toIndexedSeq: _*)
  }

  /** Delta's three-clause MERGE in one pass:
    * WHEN MATCHED AND deleteWhen THEN DELETE /
    * WHEN MATCHED THEN UPDATE SET * /
    * WHEN NOT MATCHED AND NOT deleteWhen THEN INSERT *.
    * `deleteWhen` is resolved against the SOURCE side (the CDC
    * convention: the feed carries an op flag the target never stores);
    * a delete arriving for an absent key is a no-op, matching Delta.
    * Only the target's columns survive, so source-only flag columns
    * never reach the table. */
  def conditional(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: DataFrame => org.apache.spark.sql.Column,
      updateWhen: Option[(DataFrame, DataFrame) => org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val t = target.withColumn("__t_exists", lit(true))
    val srf = source.withColumn("__s_exists", lit(true))
    val cond = keys.map(k => t(k) === srf(k)).reduce(_ && _)
    // isNotNull is two-valued, so unmatched target rows (null source
    // side) evaluate del = false && ... = false and always survive
    val sExists = srf("__s_exists").isNotNull
    val tExists = t("__t_exists").isNotNull
    val del = sExists && coalesce(deleteWhen(srf), lit(false))
    // guarded update (WHEN MATCHED AND cond THEN UPDATE, else keep):
    // the out-of-order-CDC idiom — e.g. (target, source) => source
    // version newer than target's. May read BOTH sides. Inserts are
    // never guarded (an unmatched source row has no target to keep).
    val upd = updateWhen
      .map(f => coalesce(f(t, srf), lit(false)))
      .getOrElse(lit(true))
    val takeSource = sExists && (!tExists || upd)
    val cols = target.columns.map { c =>
      when(takeSource, srf(c)).otherwise(t(c)).as(c)
    }
    t.join(srf, cond, "full_outer")
      .filter(!del)
      .select(cols.toIndexedSeq: _*)
  }
}

/** Parquet-backed store rooted at a directory; table = subdirectory. */
class ParquetStore(root: String) extends TableStore {
  private def path(name: String) = s"$root/$name"

  private def deleteRec(f: java.io.File): Unit = Fs.deleteRec(f)

  private def listFiles(name: String): Seq[java.io.File] = {
    val d = new java.io.File(path(name))
    if (!d.exists) Seq.empty
    else d.listFiles.toSeq.filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  override def overwrite(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(name))

  override def upsert(spark: SparkSession, name: String, source: DataFrame,
      keys: Seq[String]): Unit = {
    val dir = new java.io.File(path(name))
    val merged = if (!dir.exists) source
      else Merge.upsert(read(spark, name), source, keys)
    // parquet has no transaction log: stage the merge, then swap — the
    // single-writer stand-in for Delta's commit (SURVEY §3.4)
    val tmp = path(name + "__staged")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path(name))
    deleteRec(new java.io.File(tmp))
  }

  override def compact(spark: SparkSession, name: String, targetBytes: Long): OptimizeMetrics = {
    val before = listFiles(name)
    val totalBytes = before.map(_.length).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (before.size <= nOut)
      return OptimizeMetrics(0, 0, FileStats(0, 0), FileStats(0, 0),
        s"binPack($targetBytes)")
    val df = read(spark, name).repartition(nOut)
    rewrite(spark, df, name)
    val after = listFiles(name)
    OptimizeMetrics(after.size, before.size,
      FileStats(after.size, after.map(_.length).sum),
      FileStats(before.size, totalBytes), s"binPack($targetBytes)")
  }

  override def cluster(spark: SparkSession, name: String, zorderBy: Seq[String],
      bits: Int = 12): OptimizeMetrics = {
    val before = listFiles(name)
    val df = read(spark, name)
    if (df.isEmpty)
      return OptimizeMetrics(0, 0, FileStats(0, 0), FileStats(0, 0),
        s"zorder(${zorderBy.mkString(",")})")
    // shared Z-curve clustering transform (graft.functions.ZOrder):
    // range-partition + sort on the interleaved z-value so every output
    // file covers a compact curve segment → parquet min/max row-group
    // stats skip on every dimension
    val clustered = graft.functions.ZOrder.cluster(df, zorderBy, bits, before.size)
    rewrite(spark, clustered, name)
    val after = listFiles(name)
    OptimizeMetrics(after.size, before.size,
      FileStats(after.size, after.map(_.length).sum),
      FileStats(before.size, before.map(_.length).sum),
      s"zorder(${zorderBy.mkString(",")})")
  }

  /** Per-file min/max of a column across the table's parquet files — the
    * statistics data skipping reads. Exposed so callers (and tests) can
    * observe clustering quality: after [[cluster]], each file covers a
    * narrow slice of every z-ordered dimension. */
  def fileRanges(spark: SparkSession, name: String, column: String): Seq[(Double, Double)] =
    listFiles(name).flatMap { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(org.apache.spark.sql.functions.min(col(column).cast("double")),
          org.apache.spark.sql.functions.max(col(column).cast("double"))).head()
      if (r.isNullAt(0)) None else Some((r.getDouble(0), r.getDouble(1)))
    }

  override def vacuum(retainMs: Long): Long = {
    val rootDir = new java.io.File(root)
    if (!rootDir.exists) return 0L
    val cutoff = System.currentTimeMillis() - retainMs
    val stale = rootDir.listFiles.toSeq.filter(d =>
      d.isDirectory && d.getName.endsWith("__staged") && d.lastModified < cutoff)
    stale.foreach(deleteRec)
    stale.size.toLong
  }

  private def rewrite(spark: SparkSession, df: DataFrame, name: String): Unit = {
    val tmp = path(name + "__staged")
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path(name))
    deleteRec(new java.io.File(tmp))
  }
}
