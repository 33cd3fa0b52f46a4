package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-45 semantics: the power-iteration output is a unit vector whose
  * direction and Rayleigh quotient match a local from-scratch eigen
  * solve; NDCG obeys its defining inequalities and IDCG replays. */
class Wave45Spec extends SparkSuite {

  test("embed_pca_power: unit vector matching a local eigen solve") {
    val rows = SparkEntry.queries("embed_pca_power")(spark, sf).collect()
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val lam = rows.head.getDouble(2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"not unit: $norm")
    // local replay: uncentered second-moment matrix + plain power iteration
    val data = Tables.load(spark, sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = data.head.length
    val mm = Array.ofDim[Double](d, d)
    data.foreach { x =>
      var i = 0
      while (i < d) { var j = 0; while (j < d) { mm(i)(j) += x(i) * x(j); j += 1 }; i += 1 }
    }
    // replay the SAME 12-step orbit from all-ones (the oracle pins the
    // exact quantized values; this pins the algorithm)
    var u = Array.fill(d)(1.0)
    for (_ <- 1 to 12) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => mm(i)(j) * u(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      u = w.map(_ / n)
    }
    val lamLocal = (0 until d).map(i =>
      u(i) * (0 until d).map(j => mm(i)(j) * u(j)).sum).sum / data.length
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"direction mismatch, |cos|=$cos")
    assert(math.abs(lam - lamLocal) < math.abs(lamLocal) * 0.01 + 1e-6,
      s"eigenvalue $lam vs local $lamLocal")
  }

  test("eval_ndcg: bounds hold and idcg replays the ideal prefix") {
    val row = SparkEntry.queries("eval_ndcg")(spark, sf).head
    val nEn = row.getLong(row.fieldIndex("n_en"))
    val dcg = row.getDouble(row.fieldIndex("dcg"))
    val idcg = row.getDouble(row.fieldIndex("idcg"))
    val ndcg = row.getDouble(row.fieldIndex("ndcg"))
    assert(dcg > 0 && idcg > 0 && dcg <= idcg + 1e-9)
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
    assert(math.abs(ndcg - dcg / idcg) < 1e-5)
    val k = math.min(100L, nEn).toInt
    val idcgLocal = (1 to k).map(p => 1.0 / (math.log(p + 1.0) / math.log(2.0))).sum
    assert(math.abs(idcg - idcgLocal) < 1e-6, s"idcg $idcg vs $idcgLocal")
  }
}
