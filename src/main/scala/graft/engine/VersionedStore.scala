package graft.engine

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Versioned parquet table store: Delta-style time travel without Delta
  * jars (design per "Delta Lake: High-Performance ACID Table Storage
  * over Cloud Object Stores", VLDB 2020 — PAPERS.md §3; the reference
  * runs on Delta, so version history / `VERSION AS OF` reads are part of
  * its operational surface).
  *
  * Layout: `root/table/files/` holds immutable, uniquely-named parquet
  * data files; `root/table/v{N}.manifest` is snapshot N — line 1 the
  * snapshot's schema JSON, then one data-file name per line; `root/table/
  * _current` is the commit pointer (a one-line file naming the live
  * version). Writers stage data files and the manifest fully, then
  * commit by rewriting the pointer — readers of version K never observe
  * a partial write because data files and manifests are immutable after
  * commit. Single-writer semantics, like [[ParquetStore]]'s staged swap.
  *
  * This is the Delta-log file-reuse design, not copy-on-write snapshots:
  * `upsert` rewrites ONLY the data files that contain a matched key
  * (found by a column-pruned key scan + left-semi join against the
  * source keys — one shuffle, file list collected is #files-sized, the
  * same driver-side footprint as a Delta log replay); every untouched
  * file is SHARED by reference between v{N} and v{N+1}. At 100 TB, an
  * upsert touching 0.1% of keys rewrites ~0.1% of files, not the table.
  * Schema evolution is manifest-level: old files keep their narrow
  * schema on disk and the parquet reader fills absent columns with NULL
  * under the manifest's (wider) read schema, so time travel stays
  * schema-faithful per version.
  */
class VersionedStore(root: String) {

  private def tdir(name: String) = new java.io.File(s"$root/$name")
  private def filesDir(name: String) = new java.io.File(tdir(name), "files")
  private def manifestFile(name: String, v: Long) =
    new java.io.File(tdir(name), s"v$v.manifest")
  private def pointer(name: String) = new java.io.File(tdir(name), "_current")

  private def nullable(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** The live version number, or None before the first commit. */
  def currentVersion(name: String): Option[Long] = {
    val p = pointer(name)
    if (!p.exists) None
    else Some(new String(java.nio.file.Files.readAllBytes(p.toPath)).trim.toLong)
  }

  /** All committed versions, ascending. */
  def history(name: String): Seq[Long] = {
    val d = tdir(name)
    if (!d.exists) Seq.empty
    else d.listFiles.toSeq
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.manifest"))
      .map(_.getName.stripSuffix(".manifest").drop(1).toLong).sorted
  }

  /** Snapshot v's (schema, data-file names) — the manifest contents.
    * File names are relative to the table's `files/` directory. */
  def manifest(name: String, v: Long): (StructType, Seq[String]) = {
    val mf = manifestFile(name, v)
    require(mf.exists, s"$name has no version $v (history: ${history(name)})")
    val lines = java.nio.file.Files.readAllLines(mf.toPath).asScala.toSeq
    (DataType.fromJson(lines.head).asInstanceOf[StructType],
      lines.tail.filter(_.nonEmpty))
  }

  private def absPath(name: String, file: String): String =
    new java.io.File(filesDir(name), file).getAbsolutePath

  /** Write `df`'s rows as new immutable data files named for version `v`;
    * returns the new file names. The parquet job writes into a staging
    * directory, then the part files move (same filesystem, atomic per
    * file) into `files/` — a crashed stage leaves only orphans that the
    * next vacuum sweeps, never a corrupt snapshot. */
  private def stage(df: DataFrame, name: String, v: Long): Seq[String] = {
    val stageDir = new java.io.File(tdir(name), s"_stage_v$v")
    df.write.mode(SaveMode.Overwrite).parquet(stageDir.getAbsolutePath)
    val fd = filesDir(name)
    fd.mkdirs()
    val parts = stageDir.listFiles.toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val nm = f"v$v-p$i%05d.parquet"
      java.nio.file.Files.move(p.toPath, new java.io.File(fd, nm).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      nm
    }
    Fs.deleteRec(stageDir)
    moved
  }

  /** Stage the manifest for version `v`, then commit by pointer swap. */
  private def commitManifest(name: String, v: Long, schema: StructType,
      files: Seq[String]): Unit = {
    tdir(name).mkdirs()
    java.nio.file.Files.write(manifestFile(name, v).toPath,
      (nullable(schema).json +: files).mkString("\n").getBytes)
    val tmp = new java.io.File(tdir(name), "_current.tmp")
    java.nio.file.Files.write(tmp.toPath, v.toString.getBytes)
    java.nio.file.Files.move(tmp.toPath, pointer(name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Commit `df` as the next version (a full snapshot: an overwrite
    * genuinely replaces the table, so nothing is shareable) and move the
    * pointer to it. */
  def write(df: DataFrame, name: String): Long = {
    val next = currentVersion(name).getOrElse(0L) + 1L
    val staged = stage(df, name, next)
    commitManifest(name, next, df.schema, staged)
    next
  }

  /** Widen `df` to `cols`, adding NULL-typed columns it lacks (the
    * schema-evolution half of Delta's mergeSchema). */
  private def align(df: DataFrame, cols: Seq[StructField]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    df.select(cols.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** MERGE against the live snapshot, committed as a new version (the
    * reference's upsert-maintained meta-tables, with history retained).
    *
    * File-level rewrite, not table-level: a column-pruned scan of the key
    * columns + `_metadata.file_path` left-semi-joined with the source
    * keys finds the data files that contain a matched key; ONLY those
    * files feed the merge and are rewritten — every other file carries
    * over into the new manifest by name. Source rows with unmatched keys
    * (pure inserts) land in the newly staged files.
    *
    * With `evolveSchema`, source-only columns are ADDED to the table
    * (existing rows take NULL) and dropped source columns are retained
    * (source rows take NULL) — Delta mergeSchema semantics; earlier
    * versions keep their own schema (time travel is schema-faithful), and
    * carried-over files keep their narrow on-disk schema (the manifest's
    * wider read schema NULL-fills). */
  def upsert(spark: SparkSession, name: String, source: DataFrame,
      keys: Seq[String], evolveSchema: Boolean = false): Long =
    currentVersion(name) match {
      case None => write(source, name)
      case Some(cur) =>
        import org.apache.spark.sql.functions.col
        val (tSchema, tFiles) = manifest(name, cur)
        val next = cur + 1L
        // which files hold a matched key? (the only rows a MERGE changes)
        val hitPaths: Set[String] =
          if (tFiles.isEmpty) Set.empty
          else spark.read.schema(tSchema).parquet(tFiles.map(absPath(name, _)): _*)
            .select(keys.map(col) :+ col("_metadata.file_path").as("__file"): _*)
            .join(source.select(keys.map(col): _*).distinct(), keys, "left_semi")
            .select("__file").distinct()
            .collect().map(_.getString(0)).toSet
        val hitNames = tFiles.filter(n => hitPaths.exists(_.endsWith("/" + n)))
        val keepNames = tFiles.filterNot(hitNames.toSet)
        val rewriteTarget =
          if (hitNames.isEmpty) emptyDf(spark, tSchema)
          else spark.read.schema(tSchema).parquet(hitNames.map(absPath(name, _)): _*)
        val (mTarget, mSource, outSchema) =
          if (!evolveSchema) (rewriteTarget, source, tSchema)
          else {
            val all = tSchema.fields ++
              source.schema.fields.filterNot(f => tSchema.fieldNames.contains(f.name))
            (align(rewriteTarget, all), align(source, all), StructType(all))
          }
        val staged = stage(Merge.upsert(mTarget, mSource, keys), name, next)
        commitManifest(name, next, outSchema, keepNames ++ staged)
        next
    }

  /** Read the live snapshot. */
  def read(spark: SparkSession, name: String): DataFrame =
    readVersion(spark, name,
      currentVersion(name).getOrElse(sys.error(s"no committed version for $name")))

  /** Time travel: read snapshot `v` (`VERSION AS OF v`). */
  def readVersion(spark: SparkSession, name: String, v: Long): DataFrame = {
    val (schema, files) = manifest(name, v)
    if (files.isEmpty) emptyDf(spark, schema)
    else spark.read.schema(schema).parquet(files.map(absPath(name, _)): _*)
  }

  /** Change data feed between two committed versions (Delta CDF analog):
    * one row per key whose state changed, labeled insert / update /
    * delete. A keyed full-outer join of the two snapshots — the scalable
    * form: one shuffle on the key, no row-set subtraction passes. */
  def changes(spark: SparkSession, name: String, from: Long, to: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    // align both snapshots to the UNION of their schemas first: columns
    // added by evolveSchema between the versions must participate in the
    // update comparison (a value appearing in a new column IS a change),
    // and comparing in either direction must resolve.
    val rawA = readVersion(spark, name, from)
    val rawB = readVersion(spark, name, to)
    val all = rawA.schema.fields ++
      rawB.schema.fields.filterNot(f => rawA.columns.contains(f.name))
    val a = align(rawA, all).withColumn("__a", lit(true))
    val b = align(rawB, all).withColumn("__b", lit(true))
    val cond = keys.map(k => a(k) <=> b(k)).reduce(_ && _)
    val nonKeys = all.map(_.name).filter(c => !keys.contains(c))
    val differs = nonKeys.map(c => !(a(c) <=> b(c))).reduceOption(_ || _)
      .getOrElse(lit(false))
    a.join(b, cond, "full_outer")
      .withColumn("change_type",
        when(b("__b").isNull, "delete")
          .when(a("__a").isNull, "insert")
          .when(differs, "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(a(k), b(k)).as(k)) :+ col("change_type"): _*)
  }

  /** Retention: drop all but the latest `keep` manifests (Delta VACUUM
    * for history), then garbage-collect every data file no retained
    * manifest references — file sharing means deletion must be
    * reference-counted, exactly like Delta's vacuum walking the log. The
    * live version is always retained. Also sweeps `_stage_*` leftovers
    * of crashed writers. */
  def vacuumVersions(name: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the live version")
    val live = currentVersion(name).toSeq
    val drop = history(name).dropRight(keep).filterNot(live.contains)
    drop.foreach(v => manifestFile(name, v).delete())
    val referenced = history(name).flatMap(v => manifest(name, v)._2).toSet
    val fd = filesDir(name)
    if (fd.exists)
      fd.listFiles.filter(f => !referenced.contains(f.getName)).foreach(_.delete())
    tdir(name).listFiles.filter(f => f.isDirectory && f.getName.startsWith("_stage_"))
      .foreach(Fs.deleteRec)
    drop
  }
}
