package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables
import graft.functions.Native

/** Product quantization (PQ) approximate nearest neighbor — the third
  * scale path for sim_topk beside LSH buckets and the IVF index
  * (SURVEY.md §2.10 sim_topk; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — PAPERS.md).
  *
  * The embedding is split into `m` subvectors; each subspace gets its own
  * k-entry codebook (Lloyd k-means over subvectors), so a vector stores
  * as m small codes — at m=4, k=16 a 64-dim float vector compresses
  * 64×. Search is asymmetric distance computation (ADC): the query's
  * per-subspace dot products against every codebook entry form an m×k
  * lookup table (model-sized, computed on the driver), and each row's
  * approximate score is m table lookups — a completely narrow map over
  * the CODES table, no join, no shuffle, no touch of the raw vectors.
  * Exact cosine then reranks only the top ADC candidates.
  *
  * At 100 TB this is the shape that matters: the ADC scan reads
  * m bytes/vector instead of 4·dim, the lookup table broadcasts as
  * literals inside a codegen'd projection, and the rerank joins the
  * full-precision vectors for a few hundred candidates only. Training
  * collects nothing but centroids (m·k·subDim floats — a model, not
  * data); the update step is one map-side-combined groupBy per round.
  *
  * Vectors are L2-normalized before training and encoding, so maximizing
  * the PQ-approximated dot product is maximizing cosine — the metric the
  * brute-force twin (sim_topk) ranks by. Engine-specific (float k-means);
  * rows-only in the gate, recall-vs-brute pinned by PqSpec.
  */
object Pq {

  /** Unit-normalize the embedding column (dense vectors; norm > 0). */
  private[graft] def unit(e: DataFrame): DataFrame = {
    val nrm = sqrt(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x.cast("double") * x.cast("double")))
    e.withColumn("embedding",
      transform(col("embedding"), x => (x.cast("double") / nrm).cast("float")))
  }

  private def subCol(i: Int, subDim: Int) =
    slice(col("embedding"), i * subDim + 1, subDim).as(s"sub_$i")

  /** Per-subspace argmin-L2 code: with the row's ||x_m||^2 constant,
    * argmin ||x_m - c||^2 = argmax (dot(x_m, c) - ||c||^2 / 2), computed
    * by the native PqCode expression — ONE fused loop per row with the
    * codebook as a reference object, ties to the lowest code. The
    * previous composed form (k dot-product columns re-evaluated through
    * greatest + a when-chain, codebook inlined as float literals) grew
    * the m-subspace encode projection's generated source past what
    * Janino compiles in reasonable time — sim_pq stalled minutes INSIDE
    * codegen compilation at sf0.1; the math is unchanged (identical
    * double accumulation order, same tie-break). */
  private def codeCol(sub: String, codebook: Array[Array[Float]]) =
    Native.pqCode(col(sub), codebook)

  /** Train the m codebooks: deterministic init (k lowest vec_ids'
    * subvectors), then `iters` Lloyd rounds. Each round is ONE narrow
    * code-assignment projection + ONE groupBy(sub, code) with the native
    * element-wise vector-sum aggregate — the shuffle carries m·k partial
    * buffers per partition, and only centroids (m·k·subDim floats) ever
    * reach the driver. Returns [subspace][code][subDim]. */
  def train(e: DataFrame, m: Int, k: Int, iters: Int,
      trainCap: Long = 0L): Array[Array[Array[Float]]] = {
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    val subDim = dim / m
    // codebook statistics train on Ivf.trainSample's deterministic
    // hash-sample past 64·k expected vectors (full-table encode is
    // unchanged — only the per-round Lloyd scans shrink at scale)
    val t = Ivf.trainSample(e, if (trainCap > 0L) trainCap else 64L * k)
    val subs = t.select(col("vec_id") +: (0 until m).map(subCol(_, subDim)): _*)
    var books: Array[Array[Array[Float]]] = {
      val seed = subs.orderBy("vec_id").limit(k).collect()
      (0 until m).map { i =>
        seed.map(r => r.getSeq[Float](r.fieldIndex(s"sub_$i")).toArray)
      }.toArray
    }
    for (_ <- 0 until iters) {
      val coded = subs.select((0 until m).flatMap { i =>
        Seq(col(s"sub_$i"), codeCol(s"sub_$i", books(i)).as(s"code_$i"))
      }: _*)
      val pairs = coded.select(explode(array((0 until m).map { i =>
        struct(lit(i).as("sub"), col(s"code_$i").as("code"), col(s"sub_$i").as("v"))
      }: _*)).as("p")).select(col("p.sub"), col("p.code"), col("p.v"))
      val next = pairs.groupBy("sub", "code")
        .agg(Native.vecSumAgg(col("v")).as("vsum"), count(lit(1)).as("n"))
        .collect()
      // a code can lose all members mid-Lloyd; keep its previous centroid
      val updated = books.map(_.map(identity))
      next.foreach { r =>
        val n = r.getLong(r.fieldIndex("n")).toDouble
        updated(r.getInt(0))(r.getInt(1)) =
          r.getSeq[Double](r.fieldIndex("vsum")).map(x => (x / n).toFloat).toArray
      }
      books = updated
    }
    books
  }

  /** Encode every vector as its m-code array — the compressed index. */
  def encode(e: DataFrame, books: Array[Array[Array[Float]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    e.select(col("vec_id") +: (0 until m).map(subCol(_, subDim)): _*)
      .select(col("vec_id"),
        array((0 until m).map(i => codeCol(s"sub_$i", books(i))): _*).as("codes"))
  }

  /** Trained codebooks are a model: build once per (session, dir). */
  private[graft] val bookCache =
    new graft.engine.SessionCache[Array[Array[Array[Float]]]]()

  /** sim_pq: top-10 cosine neighbors of vec 0 — ADC over the compressed
    * codes (narrow map, m lookups/row), top-64 candidates, exact-cosine
    * rerank of the candidates only. Rows-only (float k-means is
    * engine-specific); recall vs brute force pinned in PqSpec. */
  private[graft] val simPq: Q = (s, dir) => {
    val e = unit(LlmPipeline.emb(s, dir).select(col("vec_id"), col("embedding")))
    val books = bookCache.getOrBuild(s, dir)(train(e, m = 4, k = 16, iters = 2))()
    val codes = graft.engine.Materialize(s, s"pq-codes:$dir") { encode(e, books) }
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val m = books.length
    val subDim = books(0)(0).length
    // ADC lookup table: dot(q_m, c) for every codebook entry — m·k
    // doubles computed on the driver, broadcast as array literals
    val lut = books.zipWithIndex.map { case (book, i) =>
      val qSub = q.slice(i * subDim, (i + 1) * subDim)
      book.map(c => c.zip(qSub).map { case (a, b) => a.toDouble * b.toDouble }.sum)
    }
    val adc = (0 until m).map { i =>
      element_at(array(lut(i).map(lit(_)): _*), col("codes")(i) + 1)
    }.reduce(_ + _)
    val cand = codes.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), adc.as("adc"))
      .orderBy(desc("adc"), asc("vec_id")).limit(64)
    // exact rerank touches only the candidate ids (broadcast semi-shape)
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(col("vec_id"), round(Native.cosineSim(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
  }

  /** Recall-gated (r08): rows are the exact brute-force top-10
    * (oracle-hashed); `recall_ok` gates the ADC+rerank result in-plan —
    * measured floor 5/10 across sf0.001–0.1 (m=4, k=16 codebooks are
    * deliberately tiny), gate at 4 (LlmPipeline.recallGate). */
  private val simPqGated: Q = (s, dir) =>
    LlmPipeline.recallGate(s, dir, simPq(s, dir), minHits = 4)

  val queries: Map[String, Q] = Map("sim_pq" -> simPqGated)
  val oracles: Map[String, String] =
    Map("sim_pq" -> LlmPipeline.annRecallOracle)
}
