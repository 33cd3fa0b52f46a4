package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-39 semantics: drop counts reconcile with the component table;
  * Pearson r matches a local moment replay and is bounded. */
class Wave39Spec extends SparkSuite {

  test("dedup_stats: totals and drops reconcile with dedup_components") {
    val rows = SparkEntry.queries("dedup_stats")(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    val dropped = SparkEntry.queries("dedup_components")(spark, sf)
      .filter(col("doc_id") =!= col("component")).count()
    assert(rows.map(_.getLong(2)).sum === dropped)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 5e-7)
    }
  }

  test("eval_score_corr: r in [-1,1] and matches a local replay") {
    val rows = SparkEntry.queries("eval_score_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    val enStop = Set("the", "and", "of", "to", "in", "is", "a", "that")
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN)
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
      val src = r.getString(0)
      val xy = docs.filter(_._1 == src).flatMap { case (_, text) =>
        val tk = "[^a-z0-9]+".r.split(text.toLowerCase).filter(_.nonEmpty)
        val dtk = tk.distinct
        val w = tk.length.toLong
        val ntok = dtk.length.toLong
        if (w == 0 || ntok == 0) None
        else {
          val sent = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
          val syl = "[aeiou]+".r.findAllIn(text.toLowerCase).length.toLong
          val x = BigDecimal(206.835 - 1.015 * (w.toDouble / sent) -
            84.6 * (syl.toDouble / w)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          val y = BigDecimal(dtk.count(enStop).toDouble / ntok)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          Some((x, y))
        }
      }
      val n = xy.length
      assert(r.getLong(1) === n.toLong)
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = math.sqrt(
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      assert(math.abs(r.getDouble(2) - num / den) < 1e-4,
        s"$src r=${r.getDouble(2)} vs ${num / den}")
    }
  }
}
