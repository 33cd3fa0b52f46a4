package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables

/** Round-6 wave 83: calibrated uncertainty + shard packing — split
  * conformal prediction (the distribution-free 90% interval around a
  * train-fit regression, validated by its test coverage: the modern
  * answer to "how wrong can this prediction be"), and a
  * WebDataset-style byte-shard manifest for the binary-payload corpus
  * (the artifact a multimodal loader actually consumes).
  */
object Wave83 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- ml_conformal_interval: split conformal regression ---------------

  /** Split conformal (Vovk; Lei et al.): fit token-count ~ char-length
    * OLS on a 70% fit split (exact centered milli moments, micro
    * coefficients — the wave-77 solve), take the 90% quantile of
    * absolute calibration-split (20%) residuals as the interval
    * half-width (order statistic k = ceil(0.9·(n+1)), the
    * finite-sample-valid rank), and report the 10% test split's
    * coverage of ŷ ± q — distribution-free theory says ≥ 90% in
    * expectation. The salted md5 split is query-local (the shared
    * content split's 1% calibration slice is too small for the k-th
    * order statistic to exist). Everything is one integer rational
    * per output. */
  private val mlConformalInterval: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        pmod(Hashing.md5Long(concat(col("text"), lit("#conformal"))
          .cast("binary")), lit(10)).as("b"),
        length(col("text")).cast("long").as("x"),
        size(LlmPipeline.tokens(col("text"))).cast("long").as("y"))
      .withColumn("split",
        when(col("b") <= 6, "train").when(col("b") <= 8, "val")
          .otherwise("test"))
      .localCheckpoint()
    val tr = d.filter(col("split") === "train")
    val m = tr.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
      .select(col("n"),
        expr("(2 * sx * 1000 + n) div (2 * n)").as("mx"),
        expr("(2 * sy * 1000 + n) div (2 * n)").as("my"))
    val cm = tr.crossJoin(broadcast(m))
      .select(col("n"), col("mx"), col("my"),
        (col("x") * 1000 - col("mx")).as("dx"),
        (col("y") * 1000 - col("my")).as("dy"))
      .groupBy("n", "mx", "my")
      .agg(sum(expr("cast(dx as decimal(38,0)) * dx")).as("sxx"),
        sum(expr("cast(dx as decimal(38,0)) * dy")).as("sxy"))
    val beta = cm
      .withColumn("b1m", expr("case when sxx = 0 then 0 else " +
        "cast(cast(sign(sxy) as long) * " +
        "((2 * abs(sxy) * 1000000 + sxx) div (2 * sxx)) as long) end"))
      .withColumn("b0n", expr("my * 1000000 - b1m * mx"))
      .select(col("n").as("n_train"), col("b0n"), col("b1m"))
      .localCheckpoint()
    // |residual| in nano y-units, per calibration doc
    def absResNano = abs(col("y") * lit(1000000000L) - col("b0n")
      - col("b1m") * col("x") * 1000)
    val cal = d.filter(col("split") === "val").crossJoin(broadcast(beta))
      .select(col("doc_id"), absResNano.as("r"))
    // k-th order statistic of the calibration residuals WITHOUT an
    // unpartitioned window: the two-phase Ranks kernel range-partitions
    // on (r, doc_id) — the calibration split is ~20% of the corpus, so
    // a single-partition row_number would serialize corpus-proportional
    // data through one task at scale (round-8 verdict weak item).
    val calRanked = Ranks.perGroupRank(cal, Seq.empty,
      Seq(col("r").asc, col("doc_id").asc), rankCol = "rk", nCol = "ncal",
      partitions = s.conf.get("spark.sql.shuffle.partitions").toInt)
    // k = ceil(0.9 * (n_cal + 1)) = (9 * (ncal + 1) + 9) div 10
    val q = calRanked
      .filter(col("rk") === expr("(9 * (ncal + 1) + 9) div 10"))
      .select(col("ncal").as("n_cal"), col("r").as("q_nano"))
    val test = d.filter(col("split") === "test").crossJoin(broadcast(beta))
      .crossJoin(broadcast(q))
      .agg(count(lit(1)).as("n_test"),
        sum(when(absResNano <= col("q_nano"), 1L).otherwise(0L)).as("covered"),
        first("n_train").as("n_train"), first("n_cal").as("n_cal"),
        first("b0n").as("b0n"), first("b1m").as("b1m"),
        first("q_nano").as("q_nano"))
    test.select(col("n_train"), col("n_cal"), col("n_test"),
      (col("b0n").cast("double") / 1e9).as("b0"),
      (col("b1m").cast("double") / 1e6).as("b1"),
      (col("q_nano").cast("double") / 1e9).as("q_90"),
      expr("cast((2 * covered * 1000000 + n_test) div (2 * n_test) as double)")
        .divide(lit(1e6)).as("coverage"))
  }

  private val mlConformalIntervalOracle = {
    val toks = LlmPipeline.duckTokens
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN b <= 6 THEN 'train' WHEN b <= 8 THEN 'val'
       |      ELSE 'test' END AS split, x, y
       |  FROM (
       |    SELECT doc_id,
       |      CAST(concat('0x', substr(md5(text || '#conformal'), 1, 15))
       |        AS BIGINT) % 10 AS b,
       |      CAST(length(text) AS BIGINT) AS x,
       |      CAST(len($toks) AS BIGINT) AS y
       |    FROM documents)),
       |tr AS (SELECT * FROM d WHERE split = 'train'),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    (2 * SUM(x)::HUGEINT * 1000 + count(*)) // (2 * count(*)) AS mx,
       |    (2 * SUM(y)::HUGEINT * 1000 + count(*)) // (2 * count(*)) AS my
       |  FROM tr),
       |cm AS (
       |  SELECT n, mx, my,
       |    SUM((x::HUGEINT * 1000 - mx) * (x::HUGEINT * 1000 - mx)) AS sxx,
       |    SUM((x::HUGEINT * 1000 - mx) * (y::HUGEINT * 1000 - my)) AS sxy
       |  FROM tr, m GROUP BY 1, 2, 3),
       |beta AS (
       |  SELECT n AS n_train,
       |    my * 1000000 - b1m * mx AS b0n, b1m
       |  FROM (
       |    SELECT n, mx, my,
       |      CASE WHEN sxx = 0 THEN 0 ELSE
       |        CAST(sign(sxy) AS HUGEINT) *
       |        ((2 * abs(sxy) * 1000000 + sxx) // (2 * sxx)) END AS b1m
       |    FROM cm)),
       |cal AS (
       |  SELECT doc_id,
       |    abs(y::HUGEINT * 1000000000 - b0n - b1m * x * 1000) AS r
       |  FROM d, beta WHERE split = 'val'),
       |q AS (
       |  SELECT ncal AS n_cal, r AS q_nano FROM (
       |    SELECT r, row_number() OVER (ORDER BY r, doc_id) AS rk,
       |      count(*) OVER () AS ncal
       |    FROM cal)
       |  WHERE rk = (9 * (ncal + 1) + 9) // 10),
       |tst AS (
       |  SELECT count(*) AS n_test,
       |    SUM(CASE WHEN abs(y::HUGEINT * 1000000000 - b0n - b1m * x * 1000)
       |      <= q_nano THEN 1 ELSE 0 END) AS covered,
       |    ANY_VALUE(n_train) AS n_train, ANY_VALUE(n_cal) AS n_cal,
       |    ANY_VALUE(b0n) AS b0n, ANY_VALUE(b1m) AS b1m,
       |    ANY_VALUE(q_nano) AS q_nano
       |  FROM d, beta, q WHERE split = 'test')
       |SELECT CAST(n_train AS BIGINT) AS n_train,
       |  CAST(n_cal AS BIGINT) AS n_cal, CAST(n_test AS BIGINT) AS n_test,
       |  CAST(b0n AS DOUBLE) / 1e9 AS b0, CAST(b1m AS DOUBLE) / 1e6 AS b1,
       |  CAST(q_nano AS DOUBLE) / 1e9 AS q_90,
       |  CAST((2 * covered::HUGEINT * 1000000 + n_test) // (2 * n_test)
       |    AS DOUBLE) / 1e6 AS coverage
       |FROM tst""".stripMargin
  }

  // ---- multimodal_shards: byte-shard manifest ----------------------------

  /** WebDataset-style shard manifest over the binary payload corpus:
    * documents in stable doc_id order, each assigned to the 64 KiB
    * shard containing its START byte offset (start = running prefix −
    * own length, from ONE Ranks prefix pass — no global window), then
    * one manifest row per shard: doc count, payload bytes, the id
    * range and the shard's start offset. The manifest is what a
    * distributed loader opens — ranges, not scans. */
  private val multimodalShards: Q = (s, dir) => {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val shard = 65536L
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("nb"))
    val pref = Ranks.perGroupPrefixSum(d, Seq.empty, Seq(col("doc_id").asc),
      col("nb"), "cum", partitions = parts)
      .withColumn("start", col("cum") - col("nb"))
      .withColumn("shard_id", expr(s"start div $shard"))
    pref.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("nb").as("payload_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        min("start").as("start_offset"))
      .orderBy("shard_id")
  }

  private val multimodalShardsOracle =
    """WITH pref AS (
      |  SELECT doc_id, nb,
      |    SUM(nb) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nb
      |      AS start
      |  FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |        FROM documents))
      |SELECT CAST(start // 65536 AS BIGINT) AS shard_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(nb) AS BIGINT) AS payload_bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  CAST(MIN(start) AS BIGINT) AS start_offset
      |FROM pref GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "ml_conformal_interval" -> mlConformalInterval,
    "multimodal_shards" -> multimodalShards
  )

  val oracles: Map[String, String] = Map(
    "ml_conformal_interval" -> mlConformalIntervalOracle,
    "multimodal_shards" -> multimodalShardsOracle
  )
}
