package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-42 semantics: mean-embedding L2 is a metric (triangle
  * inequality over label triples); WOE information-value terms are
  * non-negative and shares balance; Kneser–Ney probabilities replay
  * exactly against a local from-scratch KN model.
  */
class Wave42Spec extends SparkSuite {

  test("profile_mmd: pair count, symmetry of n, triangle inequality") {
    val rows = SparkEntry.queries("profile_mmd")(spark, sf).collect()
    val labels = rows.flatMap(r => Seq(r.getInt(0), r.getInt(1))).distinct.sorted
    val k = labels.length
    assert(rows.length === k * (k - 1) / 2, s"expected all pairs of $k labels")
    val d = rows.map(r => ((r.getInt(0), r.getInt(1)),
      r.getDouble(r.fieldIndex("mean_l2")))).toMap
    def dist(a: Int, b: Int): Double =
      if (a == b) 0.0 else d(if (a < b) (a, b) else (b, a))
    for (a <- labels; b <- labels; c <- labels if a < b && b < c) {
      assert(dist(a, c) <= dist(a, b) + dist(b, c) + 1e-5,
        s"triangle violated for ($a,$b,$c)")
    }
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("mean_l2")) >= 0.0))
  }

  test("feat_woe: iv terms non-negative; woe sign matches share imbalance") {
    val rows = SparkEntry.queries("feat_woe")(spark, sf).collect()
    assert(rows.nonEmpty)
    val gt = rows.map(_.getLong(2)).sum.toDouble
    val bt = rows.map(_.getLong(3)).sum.toDouble
    val kk = rows.length.toDouble
    rows.foreach { r =>
      val iv = r.getDouble(r.fieldIndex("iv_term"))
      assert(iv >= -1e-12, s"iv_term negative for ${r.getString(0)}")
      val gs = (r.getLong(2) + 0.5) / (gt + 0.5 * kk)
      val bs = (r.getLong(3) + 0.5) / (bt + 0.5 * kk)
      val woe = math.log(gs / bs)
      assert(math.abs(r.getDouble(r.fieldIndex("woe")) - woe) < 1e-5)
    }
  }

  test("text_kneser_ney: matches a local from-scratch KN bigram model") {
    val rows = SparkEntry.queries("text_kneser_ney")(spark, sf).collect()
    assert(rows.length === 20)
    // local replay over the same tokenizer
    val texts = Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(2).collect { case Array(a, b) => (a, b) }
    }
    val big = pairs.groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    val c1 = big.groupBy(_._1._1).map { case (w, m) => (w, m.values.sum) }
    val n1fw = big.groupBy(_._1._1).map { case (w, m) => (w, m.size.toLong) }
    val n1bw = big.groupBy(_._1._2).map { case (w, m) => (w, m.size.toLong) }
    val tt = big.size.toDouble
    rows.foreach { r =>
      val (w1, w2, c12) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(big((w1, w2)) === c12, s"count mismatch for ($w1,$w2)")
      val p = math.max(c12 - 0.75, 0.0) / c1(w1) +
        (0.75 * n1fw(w1) / c1(w1)) * (n1bw(w2) / tt)
      assert(math.abs(r.getDouble(3) - p) < 1e-5, s"p_kn mismatch for ($w1,$w2)")
    }
    // the head of the list really is the global max count
    val maxCount = big.values.max
    assert(rows.head.getLong(2) === maxCount)
  }
}
