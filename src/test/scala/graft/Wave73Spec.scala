package graft

import org.apache.spark.sql.functions._

/** Wave-73 semantics: kappa replays from the local confusion matrix;
  * clustering coefficients replay from a local adjacency scan and tie
  * out to the global triangle count. */
class Wave73Spec extends SparkSuite {

  test("eval_cohen_kappa: local confusion-matrix replay, kappa <= po") {
    val row = SparkEntry.queries("eval_cohen_kappa")(spark, sf).head
    val pairs = SparkEntry.queries("text_langid")(spark, sf)
      .select("lang", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nn = BigInt(pairs.length)
    val diag = BigInt(pairs.count(p => p._1 == p._2))
    val rowsM = pairs.groupBy(_._1).map { case (k, v) => k -> BigInt(v.length) }
    val colsM = pairs.groupBy(_._2).map { case (k, v) => k -> BigInt(v.length) }
    val peNum = rowsM.map { case (k, rn) => rn * colsM.getOrElse(k, BigInt(0)) }.sum
    val classes = (rowsM.keySet ++ colsM.keySet).size
    def microHalfUp(num: BigInt, den: BigInt): Double =
      ((2 * num * 1000000 + den) / (2 * den)).toDouble / 1e6
    val num = nn * diag - peNum
    val den = nn * nn - peNum
    val kMag = if (den == 0) BigInt(0) else (2 * num.abs * 1000000 + den) / (2 * den)
    val kappa = (if (num < 0) -kMag else kMag).toDouble / 1e6
    assert(row.getLong(0) === nn.toLong)
    assert(row.getLong(1) === classes.toLong)
    assert(row.getLong(2) === diag.toLong)
    assert(math.abs(row.getDouble(3) - microHalfUp(diag, nn)) < 1e-9)
    assert(math.abs(row.getDouble(4) - microHalfUp(peNum, nn * nn)) < 1e-9)
    assert(math.abs(row.getDouble(5) - kappa) < 1e-9)
    // chance correction can only lower the agreement number
    assert(row.getDouble(5) <= row.getDouble(3) + 1e-9)
    assert(row.getDouble(5) >= -1.0 - 1e-9 && row.getDouble(5) <= 1.0 + 1e-9)
  }

  test("graph_clustering_coeff: local adjacency replay + triangle tie-out") {
    val out = SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val edges = ops.BrandGraph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    assert(out.keySet === adj.keySet)
    var triTotal = 0L
    adj.foreach { case (v, nbrs) =>
      val d = nbrs.size.toLong
      val nbrSeq = nbrs.toSeq.sorted
      val tri = (for {
        i <- nbrSeq.indices; j <- (i + 1) until nbrSeq.size
        if adj(nbrSeq(i)).contains(nbrSeq(j))
      } yield 1).size.toLong
      triTotal += tri
      val (dg, nt, cc) = out(v)
      assert(dg === d, s"degree of $v")
      assert(nt === tri, s"triangles through $v")
      val expected =
        if (d < 2) 0.0
        else ((4 * tri * 1000000L + d * (d - 1)) / (2 * d * (d - 1))) / 1e6
      assert(math.abs(cc - expected) < 1e-9, s"cc of $v")
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9)
    }
    // every triangle touches exactly 3 corners
    val global = SparkEntry.queries("graph_triangles")(spark, sf).head.getLong(0)
    assert(triTotal === 3 * global)
  }
}
