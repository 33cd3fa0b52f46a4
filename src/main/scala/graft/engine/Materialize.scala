package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialization of expensive shared intermediates.
  *
  * The reference's pattern: expensive derived relations (profileData,
  * SchemaInformation) are written ONCE as meta-tables and every
  * downstream query reads the materialization (ref: dbc cmd8/cmd9). The
  * in-session form is a persisted DataFrame memoized per session; at
  * 100 TB the same seam writes a parquet/Delta meta-table instead —
  * output sizes here (per-column NDV aggregates, near-dup candidate
  * pairs) are orders of magnitude below input bytes.
  *
  * Sessions are map keys through a WeakHashMap: entries die with their
  * session (no cross-session collisions, no retention of DataFrames
  * bound to stopped sessions). `invalidate()` drops everything eagerly
  * (e.g. after upserts change a table).
  */
object Materialize {

  // NOT a WeakHashMap: the cached DataFrames strongly reference their
  // SparkSession, so a weak key would never be reclaimable anyway.
  // Instead, entries of STOPPED sessions are purged eagerly on every
  // lookup — sessions per JVM are few, so the scan is trivial.
  private val bySession =
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def sessionMap(spark: SparkSession) = bySession.synchronized {
    val dead = new java.util.ArrayList[SparkSession]()
    bySession.keySet.forEach(s => if (s.sparkContext.isStopped) dead.add(s))
    dead.forEach(s => { bySession.remove(s); () })
    var m = bySession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      bySession.put(spark, m)
    }
    m
  }

  /** Get-or-build: `build` runs once per (session, key); the result is
    * persisted MEMORY_AND_DISK and shared by every later caller.
    *
    * NOT computeIfAbsent: a build may itself materialize its inputs
    * (nested calls on this map), and ConcurrentHashMap throws
    * "Recursive update" when the nested key hashes into the same bin —
    * an intermittent landmine that only fires at certain map sizes.
    * get → build → putIfAbsent allows nesting; a concurrent duplicate
    * build is possible and harmless (the loser unpersists). */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val cache = sessionMap(spark)
    val existing = cache.get(key)
    if (existing != null) return existing
    val built = build.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = cache.putIfAbsent(key, built)
    if (prev != null) { built.unpersist(); prev } else built
  }

  def invalidate(): Unit = bySession.synchronized {
    import scala.jdk.CollectionConverters._
    bySession.values.asScala.foreach { m =>
      m.values.asScala.foreach { df =>
        try df.unpersist() catch { case _: Exception => () }  // session may be stopped
      }
      m.clear()
    }
    bySession.clear()
  }

  /** Replace one entry with an incrementally-derived successor. The new
    * value is localCheckpoint'ed BEFORE the old entry is dropped: the
    * successor is usually derived FROM the old materialization, and
    * Spark's non-cascading unpersist would otherwise mark the dependent
    * cache for a full-lineage rebuild (SPARK-24596) — checkpointing
    * decouples them, so the increment is the only work done. */
  def replace(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val cache = sessionMap(spark)
    val next = build.localCheckpoint()
    val old = cache.put(key, next)
    if (old != null) old.unpersist()
    next
  }
}
