package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-35 semantics: AUC matches a local replay of the rank-sum
  * identity, calibration covers every scored doc exactly once,
  * containment pairs are exactly the blocked high-containment matches,
  * and the A/A Welch test does not fire. */
class Wave35Spec extends SparkSuite {

  private def localScores(): Array[(Long, Double)] = {
    val enStop = Set("the", "and", "of", "to", "in", "is", "a", "that")
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(graft.ops.LlmPipeline.tokens(col("text"))).as("tk"))
      .collect()
      .map { r =>
        val tk = r.getSeq[String](2)
        (if (r.getString(1) == "en") 1L else 0L,
          tk.count(enStop), tk.size)
      }
      .collect { case (pos, hits, n) if n > 0 => (pos, hits.toDouble / n) }
  }

  test("eval_auc matches the local pairwise P(s+ > s-) + ties/2 replay") {
    val row = SparkEntry.queries("eval_auc")(spark, sf).head
    val sc = localScores()
    val pos = sc.filter(_._1 == 1L).map(_._2)
    val neg = sc.filter(_._1 == 0L).map(_._2)
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = num / (pos.length.toDouble * neg.length)
    assert(math.abs(row.getDouble(2) - auc) < 1e-5, s"auc ${row.getDouble(2)} vs $auc")
    // a probability: the identity can never leave [0, 1] (the synthetic
    // fixture's word-soup text makes no promise the ranker is GOOD)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("eval_calibration: bins cover every scored doc once; rates consistent") {
    val rows = SparkEntry.queries("eval_calibration")(spark, sf).collect()
    val sc = localScores()
    assert(rows.map(_.getLong(1)).sum === sc.length.toLong)
    assert(rows.map(_.getLong(2)).sum === sc.map(_._1).sum)
    rows.foreach { r =>
      val (bin, n, np) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(bin >= 0 && bin <= 9 && np <= n)
      assert(math.abs(r.getDouble(3) - np.toDouble / n) < 5e-7) // round(..., 6)
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-12) // lo <= hi
      // bin bounds contain [lo, hi] (hi may touch the next edge only at bin 9)
      assert(r.getDouble(4) >= bin / 10.0 - 1e-6)
      if (bin < 9) assert(r.getDouble(5) < (bin + 1) / 10.0 + 1e-6)
    }
  }

  test("dedup_containment: pairs are exactly the blocked >=0.8 containment matches") {
    val got = SparkEntry.queries("dedup_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(graft.ops.LlmPipeline.tokens(col("text"))).as("tk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getSeq[String](3).toSet))
    val expect = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3
      inter = (a._4 intersect b._4).size
      if inter > 0 && inter * 5 >= math.min(a._4.size, b._4.size) * 4
    } yield (a._1, b._1)).toSet
    assert(got === expect)
    // asymmetry is the point: containment admits size-skewed pairs the
    // 0.8-Jaccard dedup cannot (J <= min/max < 0.8 when sizes differ 2x)
    got.foreach { case (i, j) =>
      val a = docs.find(_._1 == i).get._4
      val b = docs.find(_._1 == j).get._4
      val cont = (a intersect b).size.toDouble / math.min(a.size, b.size)
      assert(cont >= 0.8 - 1e-9)
    }
  }

  test("events_ttest_welch: the A/A hash split is not significant; t from moments") {
    val row = SparkEntry.queries("events_ttest_welch")(spark, sf).head
    val vals = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest((r.getLong(0).toString + ":tt").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val arm = (java.lang.Long.parseLong(hex.take(15), 16) % 2).toInt
        (arm, r.getDouble(1))
      }
    val a = vals.filter(_._1 == 0).map(_._2)
    val b = vals.filter(_._1 == 1).map(_._2)
    assert(row.getLong(0) === a.length.toLong, "arm sizes")
    assert(row.getLong(1) === b.length.toLong)
    def m(x: Array[Double]) = x.sum / x.length
    assert(math.abs(row.getDouble(2) - m(a)) < 1e-4)
    assert(math.abs(row.getDouble(3) - m(b)) < 1e-4)
    def vr(x: Array[Double]) = {
      val mu = m(x); x.map(v => (v - mu) * (v - mu)).sum / (x.length - 1)
    }
    val t = (m(a) - m(b)) / math.sqrt(vr(a) / a.length + vr(b) / b.length)
    assert(math.abs(row.getDouble(row.fieldIndex("t")) - t) < 1e-3)
    assert(row.getBoolean(row.fieldIndex("significant")) === (math.abs(t) > 1.96))
  }
}
