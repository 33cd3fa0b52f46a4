package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.engine.Tables.{Col, TableMeta}

/** The reference's core program: the whole-database data profiler
  * (ref: notebooks/Create Data Profile.dbc cmd12, contracts in
  * notebooks/readme.md:18,26; SURVEY.md §2.4 `profile_histogram`).
  *
  * Re-design, not a port. The reference runs a driver-side Python double
  * loop (tables × columns) issuing one `describe`, one `limit 1` probe, one
  * per-column `collect()` and one per-column GROUP BY job each, accumulated
  * through O(tables×columns)-deep self-referential temp-view unions
  * (SURVEY.md §3.2). At 100 TB that is thousands of driver round-trips and
  * one full table scan *per column*.
  *
  * Here: schema introspection is metadata-only (`df.schema`, zero jobs) and
  * the histogram is ONE job for the whole database — each table is melted
  * column-wise in a single scan (generator over `array(struct(...))`, so
  * each table is read once, vectorized), all melts are unioned, and a single
  * hash aggregate `groupBy(databaseName, tableName, columnName, dataType,
  * value)` produces every per-column value-frequency in one shuffle.
  * Partial aggregation (map-side combine) collapses heavy hitters before
  * the exchange, and AQE coalesces the post-shuffle partitions, so the plan
  * scales linearly with input bytes on a 1000-executor cluster. The
  * columnar one-column-at-a-time access pattern is the Dremel model
  * (VLDB 2020 retrospective — PAPERS.md); Spark's vectorized parquet
  * reader provides it natively.
  */
object Profiler {

  /** The engine's logical database name for fixture dirs. */
  val dbName = "graft"

  /** Materialized histogram aggregates, keyed by (session, dir, tables).
    *
    * The reference materializes `profileData` as a meta-table ONCE and
    * serves every downstream view (summary panels, top-k value lists) from
    * it (ref: dbc cmd8 `create or replace table ... profileData`). The
    * engine mirrors that: the melted+aggregated histogram — the single
    * expensive pass over the database — is persisted on first use and
    * every profiler surface (histogram, summary, per-column top-k) reads
    * the materialization. At 100 TB the analog is writing the aggregate
    * (tiny relative to input: one row per distinct value per column) to a
    * parquet/Delta meta-table; in-session it is a MEMORY_AND_DISK persist.
    * `invalidateCache()` drops all entries (e.g. after data changes).
    */
  def invalidateCache(): Unit = graft.engine.Materialize.invalidate()

  /** The (tableName, columnName, value) -> cnt aggregate, persisted and
    * memoized. `cnt` stays BIGINT here — the float `num_records` of the
    * output contract is rendered at the edge (floats lose exactness past
    * 2^24, which a 100 TB modal count exceeds). */
  def histogramAgg(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame =
    graft.engine.Materialize(spark, s"hist:$dir:${tables.map(_.name).mkString(",")}") {
      tables.map(melt(spark, dir, _)).reduce(_ union _)
        .groupBy("tableName", "columnName", "value")
        .agg(count(lit(1)).as("cnt"))
    }

  /** Incremental maintenance: after ONE table changes (the reference's
    * upsert-driven profile refresh), recompute only that table's slice —
    * the untouched tables' aggregates are carried over from the existing
    * materialization, so the refresh scans one table, not the database.
    * At 100 TB this is the difference between a nightly full profile and
    * a per-commit refresh. */
  def refreshTable(spark: SparkSession, dir: String, table: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    val key = s"hist:$dir:${tables.map(_.name).mkString(",")}"
    val existing = histogramAgg(spark, dir, tables)
    graft.engine.Materialize.replace(spark, key) {
      existing.filter(col("tableName") =!= table)
        .union(
          melt(spark, dir, Tables.meta(table))
            .groupBy("tableName", "columnName", "value")
            .agg(count(lit(1)).as("cnt")))
    }
  }

  /** Normalized string rendering of a column value. Doubles go through
    * decimal(18,2) and timestamps through a whole-second format so the
    * rendering is engine-portable (Java vs C++ float-to-string shortest-repr
    * rules differ; SURVEY.md §7.3 risk table). */
  def fmtValue(c: Col): Column = c.sparkType match {
    case "double"    => col(c.name).cast("decimal(18,2)").cast("string")
    case t if t.startsWith("timestamp") => date_format(col(c.name), "yyyy-MM-dd HH:mm:ss")
    case _           => col(c.name).cast("string")
  }

  /** DuckDB twin of [[fmtValue]] for oracle generation. */
  def duckFmtValue(c: Col): String = c.sparkType match {
    case "double"    => s"CAST(CAST(${c.name} AS DECIMAL(18,2)) AS VARCHAR)"
    case t if t.startsWith("timestamp") => s"strftime(${c.name}, '%Y-%m-%d %H:%M:%S')"
    case _           => s"CAST(${c.name} AS VARCHAR)"
  }

  /** Melt one table: one row per (column, value) per input row — a single
    * scan of the table, no shuffle. Carries ONLY (tableName, columnName,
    * value): constants (databaseName) and column-determined attributes
    * (dataType) are re-attached after aggregation, keeping per-melted-row
    * bytes minimal through the one shuffle that matters.
    *
    * Lowered through `unpivot` (Catalyst Expand: one projection per
    * column, no per-row array/struct materialization) rather than
    * explode(array(struct(...))) — measured ~2x cheaper at sf0.1 for the
    * whole-database histogram. */
  def melt(spark: SparkSession, dir: String, t: TableMeta): DataFrame = {
    val df = Tables.balanced(spark, Tables.load(spark, dir, t.name))
    df.select(t.atomicCols.map(c => fmtValue(c).as(c.name)): _*)
      .unpivot(Array.empty[Column], t.atomicCols.map(c => col(c.name)).toArray,
        "columnName", "value")
      .select(lit(t.name).as("tableName"), col("columnName"), col("value"))
  }

  /** 51-row (table, column) -> dataType lookup, broadcast-joined onto
    * aggregate outputs. */
  private def typesDF(spark: SparkSession, tables: Seq[TableMeta]) = {
    import spark.implicits._
    (for (t <- tables; c <- t.atomicCols) yield (t.name, c.name, c.sparkType))
      .toDF("tableName", "columnName", "dataType")
  }

  /** Intended-semantics profiler (SURVEY.md §5.3 adjudication): one row per
    * (table, column, distinct value) with its frequency. Output contract =
    * profileData(databaseName, tableName, columnName, dataType, value,
    * num_records float, len float) (ref: dbc cmd8; notebooks/readme.md:18).
    */
  def profileHistogram(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    // Group only on the functional key (table, column, value); dataType is
    // broadcast-joined back onto the (much smaller) aggregate output and
    // databaseName is a literal — shorter keys, fewer bytes through the
    // single shuffle, cheaper hashing in partial and final aggregates.
    histogramAgg(spark, dir, tables)
      .withColumn("num_records", col("cnt").cast("float")).drop("cnt")
      .join(broadcast(typesDF(spark, tables)), Seq("tableName", "columnName"))
      .select(lit(dbName).as("databaseName"), col("tableName"), col("columnName"),
        col("dataType"), col("value"), col("num_records"),
        length(col("value")).cast("float").as("len"))
      .orderBy(col("tableName"), col("columnName"), col("value"))
  }

  /** DuckDB oracle for [[profileHistogram]], generated from the same
    * metadata (one GROUP BY per column, UNION ALL). */
  def profileHistogramOracle(tables: Seq[TableMeta] = Tables.all): String = {
    val parts = for (t <- tables; c <- t.atomicCols) yield
      s"""SELECT '$dbName' AS databaseName, '${t.name}' AS tableName, '${c.name}' AS columnName, '${c.sparkType}' AS dataType, value, CAST(COUNT(*) AS REAL) AS num_records, CAST(LENGTH(value) AS REAL) AS len FROM (SELECT ${duckFmtValue(c)} AS value FROM ${t.name}) GROUP BY value"""
    parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tableName, columnName, value NULLS FIRST")
  }

  /** As-built variant reproducing the reference's shipped bug (SURVEY.md
    * §5.3): `value` holds the column NAME (quoted literal in the f-string,
    * dbc cmd12), `len` its length, while grouping still runs over the real
    * column. The reference accumulates through SQL `union` (set semantics),
    * so duplicate (…, count) rows collapse — reproduced via distinct. */
  /** As-built melt+agg, materialized like [[histogramAgg]] (the reference
    * writes this exact aggregate as the `profileData` meta-table). Group
    * key is the RAW string cast (the shipped bug groups real values but
    * emits column names), so it cannot share [[histogramAgg]]'s normalized
    * rendering. */
  private def histogramAggAsBuilt(spark: SparkSession, dir: String,
      tables: Seq[TableMeta]): DataFrame =
    graft.engine.Materialize(spark,
      s"hist-asbuilt:$dir:${tables.map(_.name).mkString(",")}") {
      tables.map { t =>
        val df = Tables.balanced(spark, Tables.load(spark, dir, t.name))
        df.select(t.atomicCols.map(c => col(c.name).cast("string").as(c.name)): _*)
          .unpivot(Array.empty[Column], t.atomicCols.map(c => col(c.name)).toArray,
            "columnName", "groupKey")
          .select(lit(t.name).as("tableName"), col("columnName"), col("groupKey"))
      }.reduce(_ union _)
        .groupBy("tableName", "columnName", "groupKey")
        .agg(count(lit(1)).cast("float").as("num_records"))
    }

  def profileHistogramAsBuilt(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    histogramAggAsBuilt(spark, dir, tables)
      // reference semantics: only (table, column, count) survive — distinct
      // values sharing a count collapse under the SQL-union set semantics
      .select(col("tableName"), col("columnName"), col("num_records"))
      .distinct()
      .join(broadcast(typesDF(spark, tables)), Seq("tableName", "columnName"))
      .select(lit(dbName).as("databaseName"), col("tableName"), col("columnName"),
        col("dataType"), col("columnName").as("value"), col("num_records"),
        length(col("columnName")).cast("float").as("len"))
      .orderBy(col("tableName"), col("columnName"), col("num_records"))
  }

  def profileHistogramAsBuiltOracle(tables: Seq[TableMeta] = Tables.all): String = {
    val parts = for (t <- tables; c <- t.atomicCols) yield
      s"""SELECT DISTINCT '$dbName' AS databaseName, '${t.name}' AS tableName, '${c.name}' AS columnName, '${c.sparkType}' AS dataType, '${c.name}' AS value, CAST(COUNT(*) AS REAL) AS num_records, CAST(LENGTH('${c.name}') AS REAL) AS len FROM ${t.name} GROUP BY CAST(${c.name} AS VARCHAR)"""
    parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tableName, columnName, num_records")
  }

  /** SchemaInformation: one row per (table, column), from parquet footers
    * only — zero Spark jobs, the re-design of the reference's per-table
    * DESCRIBE loop (ref: dbc cmd12 schemaSQL; contract dbc cmd9 /
    * notebooks/readme.md:26). */
  def schemaInformation(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    import spark.implicits._
    val rows = for (t <- tables; f <- Tables.load(spark, dir, t.name).schema.fields)
      yield (dbName, t.name, f.name, f.dataType.sql.toLowerCase, "")
    rows.toDF("databaseName", "tableName", "columnName", "dataType", "comments")
      .orderBy("tableName", "columnName")
  }

  def schemaInformationOracle(tables: Seq[TableMeta] = Tables.all): String = {
    val values = for (t <- tables; c <- t.cols)
      yield s"('$dbName','${t.name}','${c.name}','${c.sparkType}','')"
    s"""SELECT * FROM (VALUES ${values.mkString(",")}) AS t(databaseName, tableName, columnName, dataType, comments) ORDER BY tableName, columnName"""
  }

  /** Compact per-column profile derived from the histogram in the same
    * single-shuffle pass: distinct-value count, total rows, null count,
    * and the modal (most frequent) value's count — the summary a profiler
    * UI shows per column (ref purpose: notebooks/readme.md:20). */
  def profileSummary(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    histogramAgg(spark, dir, tables)
      .groupBy("tableName", "columnName")
      .agg(
        count(lit(1)).as("ndv"),
        sum(col("cnt")).as("n_rows"),
        sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        max(col("cnt")).as("modal_freq"))
      .orderBy("tableName", "columnName")
  }

  def profileSummaryOracle(tables: Seq[TableMeta] = Tables.all): String = {
    val parts = for (t <- tables; c <- t.atomicCols) yield
      s"""SELECT '${t.name}' AS tableName, '${c.name}' AS columnName, CAST(COUNT(*) AS BIGINT) AS ndv, CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(SUM(CASE WHEN value IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null, CAST(MAX(cnt) AS BIGINT) AS modal_freq FROM (SELECT value, COUNT(*) AS cnt FROM (SELECT ${duckFmtValue(c)} AS value FROM ${t.name}) GROUP BY value)"""
    parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tableName, columnName")
  }

  /** Per-column Shannon entropy (nats) from the SAME single-pass
    * histogram aggregate the whole profiler rides: H = -Σ p·ln p over
    * each column's value frequencies — the "how key-like / how
    * informative is this column" panel (uniform keys → ln(n), constants
    * → 0) that complements ndv/modal_freq in profileSummary. Totals are
    * a column-cardinality aggregate broadcast back; the p·ln p addends
    * are rounded to 9 and DECIMAL-summed, so the float entropy is
    * partial-aggregation-order-proof cross-engine. */
  def profileEntropy(spark: SparkSession, dir: String,
      tables: Seq[TableMeta] = Tables.all): DataFrame = {
    val h = histogramAgg(spark, dir, tables)
    val tot = h.groupBy("tableName", "columnName")
      .agg(sum(col("cnt")).cast("double").as("n"))
    val p = col("cnt").cast("double") / col("n")
    h.join(broadcast(tot), Seq("tableName", "columnName"))
      .select(col("tableName"), col("columnName"),
        round(p * log(p), 9).cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("a"))
      .groupBy("tableName", "columnName")
      .agg(count(lit(1)).as("ndv"),
        round((sum(col("a")) * lit(-1)).cast("double"), 6).as("entropy"))
      .orderBy("tableName", "columnName")
  }

  def profileEntropyOracle(tables: Seq[TableMeta] = Tables.all): String = {
    val parts = for (t <- tables; c <- t.atomicCols) yield
      s"""SELECT '${t.name}' AS tableName, '${c.name}' AS columnName, CAST(COUNT(*) AS BIGINT) AS ndv, round(CAST(SUM(CAST(round((cnt / n) * ln(cnt / n), 9) AS DECIMAL(18,9))) * -1 AS DOUBLE), 6) AS entropy FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt, CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS n FROM (SELECT ${duckFmtValue(c)} AS value FROM ${t.name}) GROUP BY value)"""
    parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY tableName, columnName")
  }

  /** Numeric column statistics — the "data profile" purpose implied by the
    * reference README (SURVEY.md §2.4 `agg_stats`). Exact decimal sums keep
    * the oracle hash-stable; avg is derived from the exact sum. */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // Single pass, no row explosion: all per-column aggregates are computed
    // side by side in ONE global aggregate (the input is scanned once and
    // never multiplied ×columns through a shuffle), then the one result
    // row is unpacked into the per-column shape — the melt happens on 1
    // row, not 100 TB of them.
    val aggs = numCols.flatMap { c =>
      val v = col(c).cast("decimal(18,2)")
      Seq(
        count(v).as(s"${c}_n"),
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        min(v).cast("double").as(s"${c}_min"),
        max(v).cast("double").as(s"${c}_max"),
        sum(v).cast("double").as(s"${c}_sum"))
    }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val rows = numCols.map { c =>
      struct(lit(c).as("columnName"), col(s"${c}_n").as("n_nonnull"),
        col(s"${c}_nulls").as("n_null"), col(s"${c}_min").as("min_v"),
        col(s"${c}_max").as("max_v"), col(s"${c}_sum").as("sum_v"))
    }
    one.select(explode(array(rows: _*)).as("kv")).select(col("kv.*"))
      .withColumn("avg_v", col("sum_v") / col("n_nonnull"))
      .orderBy("columnName")
  }

  def columnStatsOracle: String = {
    val parts = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS columnName, CAST(COUNT(v) AS BIGINT) AS n_nonnull, CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v, CAST(SUM(v) AS DOUBLE) AS sum_v, CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_v FROM (SELECT CAST($c AS DECIMAL(18,2)) AS v FROM lineitem)"""
    }
    parts.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY columnName")
  }
}
