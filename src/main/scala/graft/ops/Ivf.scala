package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables
import graft.functions.Native

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions vectors into k cells; a query searches only the
  * `nprobe` cells whose centroids are nearest — the second scale path for
  * sim_topk beside LSH buckets (SURVEY.md §2.10 sim_topk; distributed
  * top-k structure per REPOSE, ICDE 2021 — PAPERS.md).
  *
  * Training is Lloyd iterations expressed as DataFrame ops: assignment is
  * a broadcast of k centroids (model-sized, like any ML model — k*dim
  * doubles on the driver is the standard contract, NOT a data collect);
  * the update step is posexplode → groupBy(cell, dim) → avg — one shuffle
  * per iteration, linear in rows. At 100 TB: training runs on a sample,
  * assignment is one narrow map per vector, and each query touches
  * nprobe/k of the corpus.
  */
object Ivf {

  /** Deterministic k-means: init = the k lowest-vec_id vectors; `iters`
    * Lloyd rounds. Returns (cellId, centroid) pairs. */
  def train(e: DataFrame, k: Int, iters: Int): Array[(Int, Array[Float])] = {
    val spark = e.sparkSession
    import spark.implicits._
    var centroids: Array[(Int, Array[Float])] = e
      .orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](r.fieldIndex("embedding")).toArray) }
    for (_ <- 0 until iters) {
      val cdf = centroids.toSeq.toDF("cell", "centroid")
      val assigned = assign(e, cdf)
      centroids = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .collect()
        .map { r =>
          (r.getInt(0),
            r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1).toFloat).toArray)
        }
    }
    centroids
  }

  /** Assign each vector to its nearest cell: the k centroids ride along as
    * an array LITERAL (model-sized, like any broadcast ML model), and the
    * argmax is a per-row array reduction — a completely narrow map, no
    * join, no shuffle, no window. Ties break to the lowest cell id
    * (array_position finds the first maximum). */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.orderBy("cell").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("centroid")))
    val centArr = array(cents.map(c =>
      array(c.map(v => lit(v)): _*).cast("array<float>")): _*)
    e.withColumn("sims",
        transform(centArr, c => Native.cosineSim(col("embedding"), c)))
      .withColumn("cell", (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .drop("sims")
  }

  /** sim_ivf query: top-10 cosine neighbors of vec 0 searching only the
    * nprobe=4 (of k=16) cells nearest the query. Rows-only check
    * (k-means is engine-specific); recall vs brute force in IvfSpec. */
  private val simIvf: Q = (s, dir) => {
    import s.implicits._
    val e = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val centroids = train(e, k = 16, iters = 2)
    val cdf = centroids.toSeq.toDF("cell", "centroid")
    val assigned = assign(e, cdf)
    val qVec = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    // cells to probe: the 4 centroids nearest the query vector
    val probeCells = cdf.crossJoin(broadcast(qVec))
      .select(col("cell"), Native.cosineSim(col("centroid"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("cell")).limit(4)
      .select("cell")
    assigned.join(broadcast(probeCells), "cell")
      .crossJoin(broadcast(qVec))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round(Native.cosineSim(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(10)
  }

  val queries: Map[String, Q] = Map("sim_ivf" -> simIvf)
  val oracles: Map[String, String] = Map.empty
}
