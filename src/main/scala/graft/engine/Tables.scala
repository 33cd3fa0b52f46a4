package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture/table registry: the engine's catalog surface.
  *
  * The reference discovers tables dynamically via `show tables` and
  * `describe` (ref: notebooks/Create Data Profile.dbc cmd7/cmd12; SURVEY.md
  * §2.1). Our engine's catalog is a static registry over a directory of
  * parquet tables; metadata is declared once and cross-checked against the
  * runtime parquet schema by `TablesSpec`, so downstream operators
  * (profiler, describe, oracle generation) are schema-driven instead of
  * string-metaprogrammed.
  *
  * At 100 TB this registry maps 1:1 onto `spark.catalog.listTables` /
  * `listColumns` — metadata-only driver calls, no jobs.
  */
object Tables {

  /** One column: Spark SQL type string (lower-cased `DataType.sql`) and the
    * DuckDB-dialect formatting used by oracle generation. */
  final case class Col(name: String, sparkType: String) {
    def isAtomic: Boolean = !sparkType.startsWith("array")
  }

  final case class TableMeta(name: String, cols: Seq[Col]) {
    def atomicCols: Seq[Col] = cols.filter(_.isAtomic)
  }

  /** Declared metadata for every fixture table (FIXTURES.md §A). */
  val all: Seq[TableMeta] = Seq(
    TableMeta("region", Seq(Col("r_regionkey", "int"), Col("r_name", "string"))),
    TableMeta("nation", Seq(Col("n_nationkey", "int"), Col("n_name", "string"), Col("n_regionkey", "int"))),
    TableMeta("supplier", Seq(Col("s_suppkey", "bigint"), Col("s_name", "string"),
      Col("s_nationkey", "int"), Col("s_acctbal", "double"))),
    TableMeta("customer", Seq(Col("c_custkey", "bigint"), Col("c_name", "string"),
      Col("c_nationkey", "int"), Col("c_acctbal", "double"), Col("c_mktsegment", "string"))),
    TableMeta("part", Seq(Col("p_partkey", "bigint"), Col("p_name", "string"), Col("p_brand", "string"),
      Col("p_type", "string"), Col("p_size", "int"), Col("p_retailprice", "double"))),
    TableMeta("orders", Seq(Col("o_orderkey", "bigint"), Col("o_custkey", "bigint"),
      Col("o_orderstatus", "string"), Col("o_totalprice", "double"),
      Col("o_orderdate", "timestamp_ntz"), Col("o_orderpriority", "string"))),
    TableMeta("lineitem", Seq(Col("l_orderkey", "bigint"), Col("l_partkey", "bigint"),
      Col("l_suppkey", "bigint"), Col("l_linenumber", "int"), Col("l_quantity", "double"),
      Col("l_extendedprice", "double"), Col("l_discount", "double"), Col("l_tax", "double"),
      Col("l_returnflag", "string"), Col("l_linestatus", "string"), Col("l_shipdate", "timestamp_ntz"))),
    TableMeta("events", Seq(Col("event_id", "bigint"), Col("ts", "timestamp"), Col("user_id", "bigint"),
      Col("event_type", "string"), Col("value", "double"), Col("props", "string"))),
    TableMeta("documents", Seq(Col("doc_id", "bigint"), Col("text", "string"), Col("lang", "string"),
      Col("source", "string"), Col("n_chars", "bigint"))),
    TableMeta("embeddings", Seq(Col("vec_id", "bigint"), Col("embedding", "array<float>"),
      Col("label", "int")))
  )

  def meta(name: String): TableMeta = all.find(_.name == name).get

  /** Sentinel `dir`: resolve table names through the session catalog
    * (temp views, registered databases) instead of a parquet directory —
    * every operator takes (session, dir), so passing [[CatalogDir]]
    * points the SAME query code at a live warehouse. */
  val CatalogDir = "catalog:"

  /** Dynamic catalog discovery — the reference's `show tables` +
    * per-table `describe` loop (ref: dbc cmd7/cmd12), as metadata-only
    * driver calls (no jobs): one TableMeta per table visible to
    * `spark.catalog.listTables`, columns in schema order with their
    * catalog type strings (the same lower-case `DataType.sql` convention
    * as the declared registry, so the profiler/oracle machinery is
    * source-agnostic). `names` narrows discovery (e.g. to the views one
    * test registered); default is everything listed. */
  def fromCatalog(spark: SparkSession, names: Seq[String] = Seq.empty): Seq[TableMeta] = {
    val listed = spark.catalog.listTables().collect().toSeq
      .filter(t => names.isEmpty || names.contains(t.name))
      .sortBy(_.name)
    listed.map { t =>
      val cols = spark.catalog.listColumns(t.name).collect().toSeq
        .map(c => Col(c.name, c.dataType.toLowerCase))
      TableMeta(t.name, cols)
    }
  }

  /** Re-balance a low-split input across the cluster before a CPU-heavy
    * stage (explode / hashing). Test fixtures are single-row-group parquet
    * files — an unsplittable 1-task scan — so downstream work would run on
    * one core no matter the cluster size. At 100 TB inputs have far more
    * splits than cores and this is a no-op; the round-robin shuffle only
    * fires when input partitions < cores, and then it moves little data by
    * construction. */
  def balanced(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Parquet footer schemas memoized per (dir, table): every `load` call
    * otherwise re-reads footers for schema inference — pure driver-side
    * latency repeated by every query in a session. ONLY the read-only
    * fixture roots are cached: a path that can be rewritten in place
    * (temp dirs in tests, store roots) must re-infer, or an in-place
    * schema change would silently serve the stale schema forever. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), org.apache.spark.sql.types.StructType]()

  /** Roots whose contents are immutable (schemas safe to memoize);
    * embedders can extend for their own read-only data lakes. */
  @volatile var immutableRoots: Seq[String] = Seq("/root/testdata/")

  private def cachedSchema(spark: SparkSession, dir: String, name: String)(
      read: => DataFrame): org.apache.spark.sql.types.StructType =
    if (immutableRoots.exists(dir.startsWith))
      schemaCache.computeIfAbsent((dir, name), _ => read.schema)
    else read.schema

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith(CatalogDir)) {
      // catalog-resolved tables already carry metastore types; the
      // parquet-footer special cases below don't apply
      spark.table(name)
    } else if (name == "events") {
      // events.ts has shipped in two fixture encodings: parquet
      // TIMESTAMP(NANOS), which Spark 4 refuses to map to TimestampType
      // (read as raw long nanos, truncated to micros), and plain
      // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
      // TIMESTAMP_NTZ. Detect from the footer schema and normalize both
      // to session-TZ TimestampType (session is UTC, so the NTZ wall
      // clock is the same instant the nanos encoding carried).
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val sch = cachedSchema(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))
      val raw = spark.read.schema(sch).parquet(s"$dir/$name.parquet")
      sch.apply("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // NTZ -> TimestampType reads the wall clock in the SESSION
          // zone; pin it to UTC so the instant matches what the nanos
          // encoding carried even under a non-UTC embedding session
          spark.conf.set("spark.sql.session.timeZone", "UTC")
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else {
      val sch = cachedSchema(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))
      spark.read.schema(sch).parquet(s"$dir/$name.parquet")
    }
}
