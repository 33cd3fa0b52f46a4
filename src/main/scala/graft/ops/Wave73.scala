package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q

/** Round-6 wave 73: agreement + local graph structure — Cohen's kappa
  * (the chance-corrected agreement between the declared language label
  * and the n-gram language identifier: raw accuracy flatters any gate
  * on a skewed corpus, kappa is the honest number), and per-node
  * clustering coefficients of the brand co-purchase graph (which
  * brands sit inside tightly-knit purchase cliques vs on bridges —
  * the node-level read the global triangle count can't give).
  */
object Wave73 {

  // ---- eval_cohen_kappa: chance-corrected langid agreement -------------

  /** Cohen's kappa of lang_pred vs the declared lang over text_langid's
    * audited plan: ONE cell aggregation (model-sized confusion matrix),
    * then po, pe and kappa = (N·diag − Σ row_k·col_k) / (N² − Σ
    * row_k·col_k) as exact DECIMAL rationals, sign-magnitude rounded to
    * micro (kappa can be negative — worse than chance). The marginal
    * product joins on the class key, so absent row/column marginals
    * contribute their true zero. */
  private val evalCohenKappa: Q = (s, dir) => {
    val cells = LlmPipeline.queries("text_langid")(s, dir)
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rows = cells.groupBy("lang").agg(sum("n").as("rn"))
      .select(col("lang").as("k"), col("rn"))
    val cols = cells.groupBy("lang_pred").agg(sum("n").as("cn"))
      .select(col("lang_pred").as("k"), col("cn"))
    val pe = rows.join(cols, "k")
      .agg(sum(expr("cast(rn as decimal(38,0)) * cn")).as("pe_num"))
    val classes = cells.select(col("lang").as("k"))
      .union(cells.select(col("lang_pred").as("k"))).distinct()
      .agg(count(lit(1)).as("n_classes"))
    cells.agg(sum("n").as("nn"),
        sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(0L))
          .as("diag"))
      .crossJoin(broadcast(pe)).crossJoin(broadcast(classes))
      .withColumn("num", expr("cast(nn as decimal(38,0)) * diag - pe_num"))
      .withColumn("den", expr("cast(nn as decimal(38,0)) * nn - pe_num"))
      .withColumn("kmag", expr(
        "case when den = 0 then 0 else cast((2 * abs(num) * 1000000 + den) div (2 * den) as long) end"))
      .select(col("nn").as("n"), col("n_classes"), col("diag").as("agree"),
        expr("cast((2 * diag * 1000000 + nn) div (2 * nn) as double)")
          .divide(lit(1e6)).as("po"),
        expr("cast((2 * pe_num * 1000000 + cast(nn as decimal(38,0)) * nn) div " +
          "(2 * cast(nn as decimal(38,0)) * nn) as double)")
          .divide(lit(1e6)).as("pe"),
        (when(col("num") < 0, -col("kmag")).otherwise(col("kmag"))
          .cast("double") / 1e6).as("kappa"))
  }

  private def evalCohenKappaOracle: String = {
    val langid = LlmPipeline.oracles("text_langid")
    s"""WITH l AS ($langid),
       |cells AS MATERIALIZED (
       |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
       |  FROM l GROUP BY 1, 2),
       |rows_ AS (SELECT lang AS k, SUM(n) AS rn FROM cells GROUP BY 1),
       |cols_ AS (SELECT lang_pred AS k, SUM(n) AS cn FROM cells GROUP BY 1),
       |pe AS (SELECT SUM(rn::HUGEINT * cn) AS pe_num
       |       FROM rows_ JOIN cols_ USING (k)),
       |cls AS (SELECT CAST(count(*) AS BIGINT) AS n_classes FROM (
       |  SELECT lang AS k FROM cells UNION SELECT lang_pred FROM cells)),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |  CAST(SUM(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS BIGINT)
       |    AS diag FROM cells),
       |kk AS (SELECT nn, diag, pe_num, n_classes,
       |  nn::HUGEINT * diag - pe_num AS num,
       |  nn::HUGEINT * nn - pe_num AS den
       |  FROM tot, pe, cls)
       |SELECT nn AS n, n_classes, diag AS agree,
       |  CAST((2 * diag::HUGEINT * 1000000 + nn) // (2 * nn) AS DOUBLE) / 1e6
       |    AS po,
       |  CAST((2 * pe_num * 1000000 + nn::HUGEINT * nn)
       |    // (2 * nn::HUGEINT * nn) AS DOUBLE) / 1e6 AS pe,
       |  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
       |    (CASE WHEN den = 0 THEN 0
       |     ELSE (2 * abs(num) * 1000000 + den) // (2 * den) END) AS DOUBLE)
       |    / 1e6 AS kappa
       |FROM kk""".stripMargin
  }

  // ---- graph_clustering_coeff: per-node triangle density ---------------

  /** Local clustering coefficient per brand: cc(v) = 2·tri(v) /
    * (d(v)·(d(v)−1)). Triangles come from the shared [[BrandGraph]]
    * oriented wedge closure (each triangle exactly once), exploded to
    * its three corners and counted per node — one model-sized
    * aggregation on top of the materialized edge list; degree-isolated
    * nodes (d < 2) report their true 0. Exact integer micro
    * quantization (half-up). */
  private val graphClusteringCoeff: Q = (s, dir) => {
    val perNode = BrandGraph.triangles(s, dir)
      .select(explode(array(col("a"), col("b"), col("c"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("n_tri"))
    BrandGraph.degrees(s, dir).join(perNode, Seq("x"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("cc_micro", expr(
        "case when d < 2 then 0 else " +
          "(4 * n_tri * 1000000 + d * (d - 1)) div (2 * d * (d - 1)) end"))
      .select(col("x").as("brand"), col("d").as("degree"),
        col("n_tri").as("n_triangles"),
        (col("cc_micro").cast("double") / 1e6).as("clustering_coeff"))
      .orderBy("brand")
  }

  private val graphClusteringCoeffOracle =
    """WITH basket AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM basket),
      |edges AS MATERIALIZED (
      |  SELECT a.brand AS u, b.brand AS v
      |  FROM basket a JOIN basket b ON a.ok = b.ok AND a.brand < b.brand
      |  GROUP BY 1, 2
      |  HAVING count(*) * 50 >= (SELECT n_orders FROM tot)),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM edges e1
      |  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
      |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
      |pernode AS (
      |  SELECT x, CAST(count(*) AS BIGINT) AS n_tri FROM (
      |    SELECT unnest([a, b, c]) AS x FROM tri) GROUP BY 1),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
      |  SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges) GROUP BY 1)
      |SELECT deg.x AS brand, deg.d AS degree,
      |  COALESCE(pernode.n_tri, 0) AS n_triangles,
      |  CAST(CASE WHEN deg.d < 2 THEN 0
      |    ELSE (4 * COALESCE(pernode.n_tri, 0) * 1000000 + deg.d * (deg.d - 1))
      |      // (2 * deg.d * (deg.d - 1)) END AS DOUBLE) / 1e6
      |    AS clustering_coeff
      |FROM deg LEFT JOIN pernode USING (x)
      |ORDER BY brand""".stripMargin

  val queries: Map[String, Q] = Map(
    "eval_cohen_kappa" -> evalCohenKappa,
    "graph_clustering_coeff" -> graphClusteringCoeff
  )

  val oracles: Map[String, String] = Map(
    "eval_cohen_kappa" -> evalCohenKappaOracle,
    "graph_clustering_coeff" -> graphClusteringCoeffOracle
  )
}
