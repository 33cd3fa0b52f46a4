package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables
import graft.functions.ZOrder

/** Lakehouse-maintenance query surface (SURVEY.md §3.3, §4.1): the Z-order
  * key itself is oracle-checked (pure integer bit arithmetic, identical in
  * both dialects); file-level compaction/cluster effects are covered by
  * MaintenanceSpec (file counts, ordering, idempotence) since DuckDB has no
  * notion of our file layout.
  */
object MaintenanceQueries {

  private val bits = 8

  /** Z-value of (p_size, p_partkey mod 256) per part row — the clustering
    * key the store sorts by (ref: OPTIMIZE ZORDER BY, dbc cmd16/17). */
  private val zorderKey: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .select(col("p_partkey"),
        graft.functions.Native.zvalue(bits, col("p_size"), col("p_partkey") % 256).as("zval"))
      .orderBy("p_partkey")

  /** Rows enumerated in Z-curve order — what a clustered rewrite persists. */
  private val zorderOrder: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        graft.functions.Native.zvalue(bits, col("p_size"), col("p_partkey") % 256).as("zval"))
      .orderBy("zval", "p_partkey")

  val queries: Map[String, Q] = Map(
    "zorder_key" -> zorderKey,
    "zorder_order" -> zorderOrder
  )

  val oracles: Map[String, String] = Map(
    "zorder_key" ->
      s"SELECT p_partkey, ${ZOrder.zvalueSql(bits, "p_size", "p_partkey % 256")} AS zval FROM part ORDER BY p_partkey",
    "zorder_order" ->
      s"SELECT p_partkey, p_size, ${ZOrder.zvalueSql(bits, "p_size", "p_partkey % 256")} AS zval FROM part ORDER BY zval, p_partkey"
  )
}
