package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10 multimodal_cols): media as
  * opaque binary payloads + typed metadata, with decode / feature-extract /
  * frame-sample as typed `mapPartitions` stages.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE of the decode step — it stands in for
  * e.g. a JPEG decode + resize. Everything around it is real Spark
  * plumbing: schema, encoders, per-partition batching, partition-count
  * control — swap `decodeStub` for a codec call and the pipeline is
  * production-shaped. The batch unit is one partition (mirrors
  * `mapInPandas` batch semantics); executors never hold more than one
  * partition's payloads.
  */
object Multimodal {

  /** A media row: opaque bytes + metadata, the cross-modal schema. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
      lang: String, source: String)

  /** Extracted features: fixed-width vector + scalar stats. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
      features: Array[Float], frames: Array[Long])

  /** Build the media table from documents: text bytes standing in for an
    * image/audio payload (the fixtures ship no binary column). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"), col("lang"), col("source"))
      .as[MediaRow]
  }

  /** DECODE STUB — deterministic fake of the media decode + feature
    * extraction. A real deployment replaces the body with a codec
    * (JPEG/PNG decode, audio PCM, video frame grab); the signature,
    * batching and schema stay as-is. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.payload
      // fake "feature vector": 8 byte-histogram buckets, normalized
      val hist = new Array[Float](8)
      var checksum = 0L
      bytes.foreach { b =>
        hist((b & 0xFF) % 8) += 1f
        checksum = checksum * 31 + (b & 0xFF)
      }
      val n = math.max(1, bytes.length)
      for (i <- hist.indices) hist(i) /= n
      // fake "frame sample": every 32nd byte, as if sampling video frames
      val frames = bytes.indices.by(32).map(i => (bytes(i) & 0xFF).toLong).toArray
      MediaFeatures(r.doc_id, bytes.length.toLong, checksum, hist, frames)
    }

  /** The full pipeline: read → repartition for decode parallelism →
    * per-partition decode → features table. `parallelism` bounds peak
    * memory (payload bytes per task) exactly as it would for real media. */
  def extractFeatures(spark: SparkSession, dir: String, parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .repartition(parallelism, col("doc_id"))
      .mapPartitions(decodeStub)
      .toDF()
  }
}
