package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkEntry.Q
import graft.engine.Tables

/** Source/sink format surface beyond parquet: CSV and JSON with explicit
  * schemas (schema inference is a full extra pass at 100 TB — the engine
  * always supplies the schema), exercised as lossless round-trips whose
  * oracle is the ORIGINAL table: if the text format drops precision the
  * hash compare fails. Doubles survive because Spark writes shortest
  * round-trip representations; timestamps are written/read as ISO-8601
  * with explicit format.
  */
object Formats {

  /** Per-run-unique scratch root: suffixed with the Spark application id so
    * concurrent runs (bench + correctness gate) never interleave the same
    * Overwrite-then-read path. */
  private def scratch(s: SparkSession, sub: String): String =
    sys.props("java.io.tmpdir") + s"/graft-scratch-${s.sparkContext.applicationId}/$sub"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(path)

  /** customer → CSV → back; oracle = the original table. */
  private val csvRoundtrip: Q = (s, dir) => {
    val src = Tables.load(s, dir, "customer")
    val tmp = scratch(s, "csv/customer")
    writeCsv(src, tmp)
    readCsv(s, tmp, src.schema).orderBy("c_custkey")
  }

  /** orders (incl. timestamp_ntz) → JSON lines → back; oracle = original. */
  private val jsonRoundtrip: Q = (s, dir) => {
    val src = Tables.load(s, dir, "orders")
    val tmp = scratch(s, "json/orders")
    writeJson(src, tmp)
    readJson(s, tmp, src.schema).orderBy("o_orderkey")
  }

  /** Hive-style partitioned parquet: write orders partitioned by order
    * year, read back one partition. The year filter prunes at PLANNING
    * time (PartitionFilters, asserted in FormatsSpec) — at 100 TB the
    * scan touches only the matching directories, the dominant data-
    * skipping mechanism for time-organized lakes. */
  private val partitionedPrune: Q = (s, dir) => {
    val tmp = scratch(s, "part/orders")
    Tables.load(s, dir, "orders")
      .withColumn("oyear", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("oyear").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("oyear") === 1996)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("oyear").cast("bigint").as("oyear"))
      .orderBy("o_orderkey")
  }

  /** orders (incl. timestamp_ntz) → ORC → back; oracle = original. ORC
    * is the columnar alternative a mixed lake interops with — same
    * vectorized scan, pushdown, and NTZ timestamp treatment as parquet
    * in Spark, exercised losslessly end to end. */
  private val orcRoundtrip: Q = (s, dir) => {
    val src = Tables.load(s, dir, "orders")
    val tmp = scratch(s, "orc/orders")
    src.write.mode(SaveMode.Overwrite).orc(tmp)
    s.read.schema(src.schema).orc(tmp).orderBy("o_orderkey")
  }

  /** Opaque-object ingest via the binaryFile source — HOW image/audio/
    * video corpora enter a lake: one row per object (path, length,
    * content bytes), content never parsed by the engine. Fixture: the
    * region names written as individual .bin files (model-sized —
    * 5 rows — so the driver-side file write is a fixture builder, not a
    * data path), read back whole-file and verified byte-exact via
    * length + md5 against the source table. At 100 TB the same scan
    * shape holds: files pack into tasks under maxPartitionBytes,
    * pathGlobFilter/recursiveFileLookup prune at listing time, and the
    * decode seam downstream is multimodal_decode's typed mapPartitions
    * (ops/Multimodal.scala). */
  private val binaryFileSource: Q = (s, dir) => {
    val root = new java.io.File(graft.engine.Fs.freshScratch(s, "binfile"))
    root.mkdirs()
    Tables.load(s, dir, "region")
      .select(col("r_regionkey"), col("r_name")).collect()
      .foreach { r =>
        val f = new java.io.FileOutputStream(
          new java.io.File(root, s"r_${r.getInt(0)}.bin"))
        try f.write(r.getString(1).getBytes("UTF-8")) finally f.close()
      }
    s.read.format("binaryFile").load(root.getAbsolutePath)
      .select(
        element_at(split(col("path"), "/"), -1).as("fname"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy("fname")
  }

  /** Raw line-delimited text ingest via the text source — HOW an
    * unstructured crawl enters the pipeline before any schema exists:
    * one row per line, one string column. Fixture: the documents table
    * written as doc_id-tab-text lines, read back with spark.read.text
    * and re-split — round-trip hash-checked against the source. The
    * documents fixture is single-line text by construction (no newlines
    * to escape); at 100 TB the text scan splits by line boundaries
    * under maxPartitionBytes exactly like any other file source, and
    * wholetext=true is the per-file variant for document-per-file
    * corpora. */
  private val textLinesSource: Q = (s, dir) => {
    val tmp = scratch(s, "text/documents")
    Tables.load(s, dir, "documents")
      // NULL text maps to '' (concat_ws would silently DROP the tab
      // separator for a null arg and corrupt the line format) — the
      // export is total, at the declared cost that null and empty
      // collapse; the oracle mirrors the same coalesce
      .select(concat_ws("\t", col("doc_id"), coalesce(col("text"), lit(""))).as("value"))
      .write.mode(SaveMode.Overwrite).text(tmp)
    s.read.text(tmp)
      .select(
        substring_index(col("value"), "\t", 1).cast("bigint").as("doc_id"),
        // 2-arg substring runs to end of line — no truncation cap
        expr("substring(value, instr(value, '\t') + 1)").as("text"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "source_text_lines" -> textLinesSource,
    "source_csv_roundtrip" -> csvRoundtrip,
    "source_json_roundtrip" -> jsonRoundtrip,
    "source_orc_roundtrip" -> orcRoundtrip,
    "source_binaryfile" -> binaryFileSource,
    "source_partitioned" -> partitionedPrune
  )

  val oracles: Map[String, String] = Map(
    "source_text_lines" ->
      """SELECT doc_id, md5(COALESCE(text, '')) AS text_md5,
        |  CAST(length(COALESCE(text, '')) AS INT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "source_csv_roundtrip" -> "SELECT * FROM customer ORDER BY c_custkey",
    "source_json_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "source_orc_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "source_binaryfile" ->
      """SELECT concat('r_', r_regionkey, '.bin') AS fname,
        |  CAST(octet_length(encode(r_name)) AS BIGINT) AS length,
        |  md5(r_name) AS content_md5
        |FROM region ORDER BY fname""".stripMargin,
    "source_partitioned" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(YEAR(o_orderdate) AS BIGINT) AS oyear
        |FROM orders WHERE YEAR(o_orderdate) = 1996 ORDER BY o_orderkey""".stripMargin
  )
}
