package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet table store: Delta-style time travel without Delta
  * jars (design per "Delta Lake: High-Performance ACID Table Storage
  * over Cloud Object Stores", VLDB 2020 — PAPERS.md §3; the reference
  * runs on Delta, so version history / `VERSION AS OF` reads are part of
  * its operational surface).
  *
  * Layout: `root/table/v{N}/` holds snapshot N's parquet; `root/table/
  * _current` is the commit pointer (a one-line file naming the live
  * version). Writers stage the new snapshot directory fully, then commit
  * by rewriting the pointer — readers of version K never observe a
  * partial write because snapshot directories are immutable after
  * commit. Single-writer semantics, like [[ParquetStore]]'s staged swap.
  *
  * At 100 TB: snapshots share nothing here (each overwrite is a full
  * copy) — the Delta log's file-level reuse is the obvious upgrade, but
  * the API surface (read / readVersion / history / vacuumVersions) is
  * exactly what callers program against either way.
  */
class VersionedStore(root: String) {

  private def tdir(name: String) = new java.io.File(s"$root/$name")
  private def vdir(name: String, v: Long) = new java.io.File(tdir(name), s"v$v")
  private def pointer(name: String) = new java.io.File(tdir(name), "_current")

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
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).sorted
  }

  /** Commit `df` as the next version and move the pointer to it. */
  def write(df: DataFrame, name: String): Long = {
    val next = currentVersion(name).getOrElse(0L) + 1L
    df.write.mode(SaveMode.Overwrite).parquet(vdir(name, next).getAbsolutePath)
    val tmp = new java.io.File(tdir(name), "_current.tmp")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes)
    java.nio.file.Files.move(tmp.toPath, pointer(name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Widen `df` to `cols`, adding NULL-typed columns it lacks (the
    * schema-evolution half of Delta's mergeSchema). */
  private def align(df: DataFrame,
      cols: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    df.select(cols.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** MERGE against the live snapshot, committed as a new version (the
    * reference's upsert-maintained meta-tables, with history retained).
    * With `evolveSchema`, source-only columns are ADDED to the table
    * (existing rows take NULL) and dropped source columns are retained
    * (source rows take NULL) — Delta mergeSchema semantics; earlier
    * versions keep their own schema (time travel is schema-faithful). */
  def upsert(spark: SparkSession, name: String, source: DataFrame,
      keys: Seq[String], evolveSchema: Boolean = false): Long = {
    val merged = currentVersion(name) match {
      case None => source
      case Some(_) =>
        val target = read(spark, name)
        if (!evolveSchema) Merge.upsert(target, source, keys)
        else {
          val all = target.schema.fields ++
            source.schema.fields.filterNot(f => target.columns.contains(f.name))
          Merge.upsert(align(target, all), align(source, all), keys)
        }
    }
    // no staging needed: the merge reads v{N} while writing into the
    // brand-new v{N+1} directory — they never overlap (unlike
    // ParquetStore.upsert, which overwrites the dir it reads)
    write(merged, name)
  }

  /** Read the live snapshot. */
  def read(spark: SparkSession, name: String): DataFrame =
    readVersion(spark, name,
      currentVersion(name).getOrElse(sys.error(s"no committed version for $name")))

  /** Time travel: read snapshot `v` (`VERSION AS OF v`). */
  def readVersion(spark: SparkSession, name: String, v: Long): DataFrame = {
    require(vdir(name, v).exists, s"$name has no version $v (history: ${history(name)})")
    spark.read.parquet(vdir(name, v).getAbsolutePath)
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

  /** Retention: drop all but the latest `keep` versions (Delta VACUUM for
    * history). The live version is always retained. */
  def vacuumVersions(name: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the live version")
    val live = currentVersion(name).toSeq
    val drop = history(name).dropRight(keep).filterNot(live.contains)
    drop.foreach(v => Fs.deleteRec(vdir(name, v)))
    drop
  }
}
