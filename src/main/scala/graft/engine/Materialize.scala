package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialization of expensive shared intermediates.
  *
  * The reference's pattern: expensive derived relations (profileData,
  * SchemaInformation) are written ONCE as meta-tables and every
  * downstream query reads the materialization (ref: dbc cmd8/cmd9). The
  * in-session form is a persisted DataFrame memoized by (session, key);
  * at 100 TB the same seam writes a parquet/Delta meta-table instead —
  * output sizes here (per-column NDV aggregates, near-dup candidate
  * pairs) are orders of magnitude below input bytes.
  *
  * `invalidate()` drops everything (e.g. after upserts change a table).
  */
object Materialize {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

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
    val k = (System.identityHashCode(spark).toString, key)
    val existing = cache.get(k)
    if (existing != null) return existing
    val built = build.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = cache.putIfAbsent(k, built)
    if (prev != null) { built.unpersist(); prev } else built
  }

  def invalidate(): Unit = {
    import scala.jdk.CollectionConverters._
    cache.values.asScala.foreach(_.unpersist())
    cache.clear()
  }

  /** Replace one entry with an incrementally-derived successor. The new
    * value is localCheckpoint'ed BEFORE the old entry is dropped: the
    * successor is usually derived FROM the old materialization, and
    * Spark's non-cascading unpersist would otherwise mark the dependent
    * cache for a full-lineage rebuild (SPARK-24596) — checkpointing
    * decouples them, so the increment is the only work done. */
  def replace(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (System.identityHashCode(spark).toString, key)
    val next = build.localCheckpoint()
    val old = cache.put(k, next)
    if (old != null) old.unpersist()
    next
  }
}
