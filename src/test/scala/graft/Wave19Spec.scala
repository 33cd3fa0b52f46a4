package graft

import org.apache.spark.sql.functions._

/** Wave-19 semantics: confusion matrices account for every document and
  * their derived ratios are internally consistent. */
class Wave19Spec extends SparkSuite {

  test("eval_langid_confusion: cells cover the corpus; row shares sum to ~1") {
    val rows = SparkEntry.queries("eval_langid_confusion")(spark, sf).collect()
    val total = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    val docs = graft.engine.Tables.load(spark, sf, "documents").count()
    assert(total === docs)
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val share = cells.map(r => r.getDouble(r.fieldIndex("row_share"))).sum
      assert(math.abs(share - 1.0) < 1e-5, s"$lang shares sum to $share")
    }
  }

  test("eval_split_balance: one row per split, chi2 non-negative, cells bounded by sources") {
    val rows = SparkEntry.queries("eval_split_balance")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val nSources = graft.engine.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("chi2_part")) >= 0.0)
      assert(r.getLong(r.fieldIndex("n_cells")) <= nSources)
    }
  }

  test("eval_classifier_confusion: quadrants partition the corpus; F1 consistent") {
    val r = SparkEntry.queries("eval_classifier_confusion")(spark, sf).head()
    val (tp, fp, tn, fn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val docs = graft.engine.Tables.load(spark, sf, "documents").count()
    assert(tp + fp + tn + fn === docs)
    val p = r.getDouble(r.fieldIndex("precision"))
    val rec = r.getDouble(r.fieldIndex("recall"))
    val f1 = r.getDouble(r.fieldIndex("f1"))
    assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-4)
    assert(r.getDouble(r.fieldIndex("accuracy")) > 0.5, "gate must beat a coin")
  }
}
