package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10 multimodal_cols): media as
  * opaque binary payloads + typed metadata, with decode / feature-extract /
  * frame-sample as typed `mapPartitions` stages.
  *
  * Two decode paths:
  *  - `decodeStub` — a clearly-marked DETERMINISTIC FAKE standing in for
  *    codecs the container does not ship (JPEG/audio PCM/video frames);
  *    the schema, batching, and partition control around it are real.
  *  - `decodeImage` (r08) — a REAL codec path: `javax.imageio.ImageIO`
  *    ships in the JDK, so the image table synthesizes deterministic
  *    16×16 PNGs (pixel channels from a portable md5 formula), the
  *    decode stage runs an actual PNG decode to pixels, and the feature
  *    stage computes integer channel sums, a luminance histogram, and
  *    an 8×8 average-hash from 2×2 block downsampling — all in exact
  *    integer arithmetic, so the DuckDB oracle replays the features
  *    from the generative pixel formula (PNG is lossless: decoded
  *    pixels ≡ formula pixels — that identity is itself the codec
  *    correctness check).
  *
  * The batch unit is one partition (mirrors `mapInPandas` batch
  * semantics); executors never hold more than one partition's payloads.
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

  // ---- real-codec image path (r08) --------------------------------------

  val ImgW = 16
  val ImgH = 16

  /** Deterministic pixel formula, portable to DuckDB: channel values are
    * bytes of the 60-bit md5 prefix of "docId#x#y" (the engine-wide
    * Hashing.md5Long convention). */
  private[graft] def pixelValue(md: java.security.MessageDigest,
      docId: Long, x: Int, y: Int): (Int, Int, Int) = {
    md.reset()
    val d = md.digest(s"$docId#$x#$y".getBytes("UTF-8"))
    // 60-bit big-endian prefix = parseLong(hex.take(15), 16), computed
    // straight from the digest bytes (the hex-format/parse pair cost
    // ~20 allocations per PIXEL — round-9 trim, value bit-identical)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    ((v & 255L).toInt, ((v >> 8) & 255L).toInt, ((v >> 16) & 255L).toInt)
  }

  /** Synthesize the doc's 16×16 RGB PNG — REAL ImageIO encode. The PNG
    * byte stream is encoder-dependent (never hashed); the pixels are
    * the deterministic contract. */
  private[graft] def syntheticPng(docId: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val (r, g, b) = pixelValue(md, docId, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image features, all exact integers:
    *  - channel sums over the 256 pixels;
    *  - 8-bucket luminance histogram (lum = (299r+587g+114b)/1000
    *    integer division, bucket = lum/32);
    *  - 8×8 average-hash from 2×2 block DOWNSAMPLING (the real resize
    *    step): bit (by*8+bx) set iff blockLumSum·64 > totalLumSum. */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, lum_hist: String, ahash: Long)

  /** REAL decode: ImageIO on the PNG payload, then pixel math. The
    * in-memory stream cache is disabled (ImageIO's default spools every
    * read through a temp FILE — measured ~2× the whole decode cost).
    * Round-9 trim (verdict task 6): ONE PNG `ImageReader` and one pixel
    * buffer per PARTITION instead of `ImageIO.read`'s per-row registry
    * lookup + reader allocation, and one bulk `getRGB(0,0,w,h,...)`
    * instead of w×h per-pixel ColorModel calls. Features bit-identical
    * (same decoded pixels, same integer math). */
  def decodeImage(rows: Iterator[MediaRow]): Iterator[ImageFeatures] = {
    javax.imageio.ImageIO.setUseCache(false)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    var buf: Array[Int] = null
    val mapped = rows.map { r =>
      // per-row input stream is closed after the read; the shared reader
      // is disposed when the partition iterator is exhausted (below)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val img = try {
        reader.setInput(iis, true, true)
        try reader.read(0) catch {
          case e @ (_: java.io.IOException | _: IllegalArgumentException) =>
            // keep the codec's root cause on the failure instead of a
            // generic message
            throw new IllegalArgumentException(
              s"doc ${r.doc_id}: payload is not a decodable image", e)
        }
      } finally iis.close()
      val w = img.getWidth; val h = img.getHeight
      if (buf == null || buf.length < w * h) buf = new Array[Int](w * h)
      img.getRGB(0, 0, w, h, buf, 0, w)
      var sr = 0L; var sg = 0L; var sb = 0L; var totLum = 0L
      val hist = new Array[Long](8)
      val blockLum = new Array[Long](64)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = buf(y * w + x)
          val pr = (rgb >> 16) & 255; val pg = (rgb >> 8) & 255; val pb = rgb & 255
          sr += pr; sg += pg; sb += pb
          val lum = (299 * pr + 587 * pg + 114 * pb) / 1000
          totLum += lum
          hist(lum / 32) += 1
          blockLum((y / 2) * 8 + x / 2) += lum
          x += 1
        }
        y += 1
      }
      var ahash = 0L
      var i = 0
      while (i < 64) {
        if (blockLum(i) * 64 > totLum) ahash |= (1L << i)
        i += 1
      }
      ImageFeatures(r.doc_id, w, h, sr, sg, sb, hist.mkString(","), ahash)
    }
    new Iterator[ImageFeatures] {
      def hasNext: Boolean = {
        val more = mapped.hasNext
        if (!more) reader.dispose()
        more
      }
      def next(): ImageFeatures = mapped.next()
    }
  }

  /** Per-partition PNG encoder: same pixels and stream format as
    * [[syntheticPng]] (the property-spec'd single-image form) but the
    * `BufferedImage`, `MessageDigest` and PNG `ImageWriter` are
    * allocated ONCE per partition — `ImageIO.write` re-runs the writer
    * registry lookup and allocates a fresh image per row. */
  private[graft] def encodeImages(ids: Iterator[Long]): Iterator[MediaRow] = {
    javax.imageio.ImageIO.setUseCache(false)
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    ids.map { id =>
      var y = 0
      while (y < ImgH) {
        var x = 0
        while (x < ImgW) {
          val (r, g, b) = pixelValue(md, id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
      MediaRow(id, bos.toByteArray, "image/png", "", "")
    }
  }

  /** The real-codec pipeline: synthesize PNGs (encode), decode them with
    * ImageIO, extract integer features. Encode+decode run fused in one
    * narrow mapPartitions pass — no payload ever shuffles. */
  def extractImageFeatures(spark: SparkSession, dir: String,
      parallelism: Int = 32): DataFrame = {
    import spark.implicits._
    graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .repartition(parallelism)
      .mapPartitions(encodeImages)
      .mapPartitions(decodeImage)
      .toDF()
  }
}
