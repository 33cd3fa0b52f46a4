package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-keyed cache of named values (the session-map pattern shared by
  * [[Materialize]] and model-sized caches like the trained IVF
  * centroids).
  *
  * NOT a WeakHashMap: cached values (DataFrames, trained models) may
  * strongly reference their SparkSession, so a weak key would never be
  * reclaimable anyway. Instead, entries of STOPPED sessions are purged
  * eagerly on every lookup — sessions per JVM are few, so the scan is
  * trivial. Keying on the session object itself (not an identity hash)
  * makes collisions impossible. */
class SessionCache[T] {

  private val bySession =
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, T]]()

  /** Drop every entry whose session's context has stopped. Callers must
    * hold the bySession monitor — the ONE definition of liveness shared
    * by every accessor. */
  private def purgeDead(): Unit = {
    val dead = new java.util.ArrayList[SparkSession]()
    bySession.keySet.forEach(s => if (s.sparkContext.isStopped) dead.add(s))
    dead.forEach(s => { bySession.remove(s); () })
  }

  /** The per-session map, purging entries of stopped sessions first. */
  def sessionMap(spark: SparkSession):
      java.util.concurrent.ConcurrentHashMap[String, T] = bySession.synchronized {
    purgeDead()
    var m = bySession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, T]()
      bySession.put(spark, m)
    }
    m
  }

  /** Get-or-build. NOT computeIfAbsent: a build may itself cache nested
    * keys on this map, and ConcurrentHashMap throws "Recursive update"
    * when the nested key hashes into the same bin — an intermittent
    * landmine that only fires at certain map sizes. get → build →
    * putIfAbsent allows nesting; a concurrent duplicate build is
    * possible; `onDiscard` disposes the loser. */
  def getOrBuild(spark: SparkSession, key: String)(build: => T)
      (onDiscard: T => Unit = _ => ()): T = {
    val cache = sessionMap(spark)
    val existing = cache.get(key)
    if (existing != null) return existing
    val built = build
    val prev = cache.putIfAbsent(key, built)
    if (prev != null) { onDiscard(built); prev } else built
  }

  /** Dispose every entry with `f` and clear the cache. */
  def invalidateAll(f: T => Unit): Unit = bySession.synchronized {
    import scala.jdk.CollectionConverters._
    bySession.values.asScala.foreach { m =>
      m.values.asScala.foreach(v => f(v))
      m.clear()
    }
    bySession.clear()
  }

  /** Number of sessions currently holding entries (stopped sessions are
    * purged first — observable for retention specs). */
  def liveSessionCount: Int = bySession.synchronized {
    purgeDead()
    bySession.size
  }
}

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
  * Sessions are keyed through [[SessionCache]]: entries die with their
  * session (no cross-session collisions, no retention of DataFrames
  * bound to stopped sessions). `invalidate()` drops everything eagerly
  * (e.g. after upserts change a table). */
object Materialize {

  private val cache = new SessionCache[DataFrame]()

  /** Get-or-build: `build` runs once per (session, key); the result is
    * persisted MEMORY_AND_DISK and shared by every later caller (a
    * concurrent duplicate build is harmless — the loser unpersists). */
  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.getOrBuild(spark, key) {
      build.persist(StorageLevel.MEMORY_AND_DISK)
    } { lost => lost.unpersist(); () }

  def invalidate(): Unit =
    cache.invalidateAll { df =>
      try df.unpersist() catch { case _: Exception => () }  // session may be stopped
    }

  /** Replace one entry with an incrementally-derived successor. The new
    * value is localCheckpoint'ed BEFORE the old entry is dropped: the
    * successor is usually derived FROM the old materialization, and
    * Spark's non-cascading unpersist would otherwise mark the dependent
    * cache for a full-lineage rebuild (SPARK-24596) — checkpointing
    * decouples them, so the increment is the only work done. */
  def replace(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val next = build.localCheckpoint()
    val old = cache.sessionMap(spark).put(key, next)
    if (old != null) old.unpersist()
    next
  }
}
