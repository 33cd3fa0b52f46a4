package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-82 semantics: k-truss replays from a local peel; the GMM
  * replays from a local EM loop. */
class Wave82Spec extends SparkSuite {

  test("graph_ktruss: local peel replay; truss edges are kcore-of-triangles") {
    val out = SparkEntry.queries("graph_ktruss")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    var edges = ops.BrandGraph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def supports(es: Set[(String, String)]): Map[(String, String), Long] = {
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val has = es
      val tris = for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        k <- (j + 1) until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if has((a, b)) && has((a, c)) && has((b, c))
      } yield (a, b, c)
      tris.flatMap(t => Seq((t._1, t._2), (t._1, t._3), (t._2, t._3)))
        .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    }
    var changed = true
    var guard = 0
    while (changed && guard < 20) {
      val sp = supports(edges)
      val next = edges.filter(e => sp.getOrElse(e, 0L) >= 2)
      changed = next != edges
      edges = next
      guard += 1
    }
    val expect = supports(edges)
    assert(out.keySet === edges)
    out.foreach { case (e, s) => assert(s === expect.getOrElse(e, 0L), e) }
    // truss membership implies every edge closes >= 2 triangles
    assert(out.values.forall(_ >= 2) || out.isEmpty)
  }

  test("ml_em_gmm: local EM replay") {
    val row = SparkEntry.queries("ml_em_gmm")(spark, sf).head
    val ms = Tables.load(spark, sf, "orders")
      .select(round(col("o_totalprice")).cast("long").as("m")).collect()
      .map(r => BigInt(r.getLong(0)))
    val n = BigInt(ms.length)
    val sm = ms.sum; val smm = ms.map(x => x * x).sum
    val mm = (2 * sm * 1000 + n) / (2 * n)
    val vMicro = (2 * (n * smm - sm * sm) * 1000000 + n * n) / (2 * n * n)
    val sd = BigInt(math.round(math.sqrt(vMicro.toDouble / 1e6) * 1000))
    val zs = ms.map { m =>
      val d = m * 1000 - mm
      d.signum * ((2 * d.abs * 1000 + sd) / (2 * sd))
    }
    var (p1, mu1, v1, mu2, v2) =
      (BigInt(500000), BigInt(-1000), BigInt(1000000), BigInt(1000), BigInt(1000000))
    def resp(z: BigInt): Long = {
      val t1 = p1.toDouble / 1e6 *
        math.exp(-((z - mu1) * (z - mu1)).toDouble / (2.0 * v1.toDouble)) /
        math.sqrt(v1.toDouble)
      val t2 = (1000000 - p1).toDouble / 1e6 *
        math.exp(-((z - mu2) * (z - mu2)).toDouble / (2.0 * v2.toDouble)) /
        math.sqrt(v2.toDouble)
      math.round(t1 / (t1 + t2) * 1e9)
    }
    for (_ <- 1 to 6) {
      val rns = zs.map(z => (z, BigInt(resp(z))))
      val s1 = rns.map(_._2).sum
      val z1 = rns.map(p => p._2 * p._1).sum
      val q1 = rns.map(p => p._2 * p._1 * p._1).sum
      val s2 = n * 1000000000L - s1
      val z2 = rns.map(p => (BigInt(1000000000L) - p._2) * p._1).sum
      val q2 = rns.map(p => (BigInt(1000000000L) - p._2) * p._1 * p._1).sum
      def mStep(sc: BigInt, zc: BigInt, qc: BigInt, muOld: BigInt,
          vOld: BigInt): (BigInt, BigInt) =
        if (sc == 0) (muOld, vOld)
        else {
          val mu = zc.signum * ((2 * zc.abs + sc) / (2 * sc))
          val t = (2 * qc + sc) / (2 * sc)
          (mu, (t - mu * mu).max(BigInt(10000)))
        }
      val (m1, vv1) = mStep(s1, z1, q1, mu1, v1)
      val (m2, vv2) = mStep(s2, z2, q2, mu2, v2)
      p1 = (2 * s1 + n * 1000) / (2 * n * 1000)
      mu1 = m1; v1 = vv1; mu2 = m2; v2 = vv2
    }
    val soft1 = zs.map(z => BigInt(resp(z))).sum
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - p1.toDouble / 1e6) < 1e-9, "pi1")
    assert(math.abs(row.getDouble(2) - mu1.toDouble / 1000) < 1e-9, "mu1")
    assert(math.abs(row.getDouble(3) -
      math.rint(math.sqrt(v1.toDouble) / 1000 * 1e6) / 1e6) < 1e-6, "sd1")
    assert(math.abs(row.getDouble(4) - mu2.toDouble / 1000) < 1e-9, "mu2")
    assert(math.abs(row.getDouble(5) -
      math.rint(math.sqrt(v2.toDouble) / 1000 * 1e6) / 1e6) < 1e-6, "sd2")
    assert(math.abs(row.getDouble(6) -
      math.rint(soft1.toDouble / 1e9 * 1e3) / 1e3) < 1e-3, "soft count")
    // the two components order themselves: mu1 (init -1sigma) stays low
    assert(row.getDouble(2) < row.getDouble(4))
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.0)
  }
}
