package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q

/** Round-6 twelfth wave: model-evaluation dashboards for the two
  * in-repo classifiers — the confusion-matrix sheets a curation team
  * reads before trusting a gate to filter a 100 TB corpus.
  */
object Wave19 {

  // ---- eval_langid_confusion ------------------------------------------

  /** Confusion matrix of the n-gram language identifier against the
    * declared language label: one count per (lang, lang_pred) cell plus
    * the per-cell share of its true-label row (recall decomposition),
    * an exact integer ratio rounded once. Rides text_langid's plan plus
    * ONE cell aggregation and a broadcast of the model-sized row
    * totals. */
  private val evalLangidConfusion: Q = (s, dir) => {
    val l = LlmPipeline.queries("text_langid")(s, dir)
      .select(col("lang"), col("lang_pred"))
    val cells = l.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("lang").agg(sum("n").as("row_n"))
    cells.join(broadcast(rows), "lang")
      .select(col("lang"), col("lang_pred"), col("n"),
        round(col("n").cast("double") / col("row_n").cast("double"), 6)
          .as("row_share"))
      .orderBy("lang", "lang_pred")
  }

  private def evalLangidConfusionOracle: String = {
    val langid = LlmPipeline.oracles("text_langid")
    s"""WITH l AS ($langid),
       |cells AS (
       |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
       |  FROM l GROUP BY 1, 2),
       |rows_ AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM cells GROUP BY 1)
       |SELECT c.lang, c.lang_pred, c.n,
       |  round(CAST(c.n AS DOUBLE) / CAST(r.row_n AS DOUBLE), 6) AS row_share
       |FROM cells c JOIN rows_ r USING (lang)
       |ORDER BY lang, lang_pred""".stripMargin
  }

  // ---- eval_classifier_confusion --------------------------------------

  /** The distilled quality classifier's scorecard against its teacher
    * labels: TP/FP/TN/FN and accuracy / precision / recall / F1, every
    * ratio an exact integer quotient rounded once (identical IEEE ops
    * in both engines). One conditional-sum aggregation over the
    * classifier's audited plan — the sheet that says whether the cheap
    * distilled gate may replace the full heuristic stack at scale. */
  private val evalClassifierConfusion: Q = (s, dir) => {
    val scored = Wave7.queries("quality_classifier")(s, dir)
      .select(col("y"), col("pred"))
    scored.agg(
        sum(when(col("y") === 1 && col("pred"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0 && col("pred"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 0 && !col("pred"), 1L).otherwise(0L)).as("tn"),
        sum(when(col("y") === 1 && !col("pred"), 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"), 6)
          .as("accuracy"),
        round(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        round(col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double"), 6).as("recall"),
        round((col("tp") + col("tp")).cast("double") /
          (col("tp") + col("tp") + col("fp") + col("fn")).cast("double"), 6)
          .as("f1"))
  }

  private def evalClassifierConfusionOracle: String = {
    val clf = Wave7.oracles("quality_classifier")
    s"""WITH scored AS ($clf),
       |c AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN y = 1 AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN y = 0 AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN y = 0 AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |    CAST(SUM(CASE WHEN y = 1 AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM scored)
       |SELECT tp, fp, tn, fn,
       |  round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE), 6) AS accuracy,
       |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
       |  round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall,
       |  round(CAST(tp + tp AS DOUBLE) / CAST(tp + tp + fp + fn AS DOUBLE), 6) AS f1
       |FROM c""".stripMargin
  }

  // ---- eval_split_balance ---------------------------------------------

  /** Representativeness audit of the content-hash train/val/test split
    * (split_leakage's counterpart: that one proves no leakage, this one
    * proves no BIAS): chi-squared of source composition per split
    * against the corpus marginal. A content-hash split should be
    * source-blind — large chi2_part flags a split a model would see as
    * a domain shift. Same one-pass contingency plan as profile_chisq;
    * the split column is the SHARED [[Hashing.splitOf]] definition, so
    * the audited assignment can never drift from the produced one. */
  private val evalSplitBalance: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.engine.Tables.load(s, dir, "documents")
      .select(Hashing.splitOf(col("text")).as("split"), col("source"))
    val cells = d.groupBy("split", "source").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("split").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("source").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    cells
      .join(broadcast(rowTot), "split")
      .join(broadcast(colTot), "source")
      .crossJoin(broadcast(n))
      .select(col("split"),
        round(
          pow(col("o").cast("double") -
            (col("rt") * col("ct")).cast("double") / col("n").cast("double"), 2)
            / ((col("rt") * col("ct")).cast("double") / col("n").cast("double")),
          9).cast(DecimalType(18, 9)).as("addend"))
      .groupBy("split")
      .agg(round(sum("addend").cast("double"), 6).as("chi2_part"),
        count(lit(1)).as("n_cells"))
      .orderBy("split")
  }

  private val evalSplitBalanceOracle =
    s"""WITH d AS (
       |  SELECT ${Hashing.duckSplitCase} AS split, source FROM documents),
       |cells AS (
       |  SELECT split, source, CAST(count(*) AS BIGINT) AS o
       |  FROM d GROUP BY 1, 2),
       |rt AS (SELECT split, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       |ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
       |SELECT c.split,
       |  round(CAST(SUM(CAST(round(
       |    POW(CAST(c.o AS DOUBLE) - CAST(r.rt * t.ct AS DOUBLE) / CAST(n.n AS DOUBLE), 2)
       |      / (CAST(r.rt * t.ct AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
       |    AS DECIMAL(18,9))) AS DOUBLE), 6) AS chi2_part,
       |  CAST(count(*) AS BIGINT) AS n_cells
       |FROM cells c JOIN rt r USING (split) JOIN ct t USING (source)
       |CROSS JOIN n
       |GROUP BY c.split ORDER BY split""".stripMargin

  val queries: Map[String, Q] = Map(
    "eval_langid_confusion" -> evalLangidConfusion,
    "eval_classifier_confusion" -> evalClassifierConfusion,
    "eval_split_balance" -> evalSplitBalance)
  val oracles: Map[String, String] = Map(
    "eval_langid_confusion" -> evalLangidConfusionOracle,
    "eval_classifier_confusion" -> evalClassifierConfusionOracle,
    "eval_split_balance" -> evalSplitBalanceOracle)
}
