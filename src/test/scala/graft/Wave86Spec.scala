package graft

import java.security.MessageDigest

import graft.engine.Tables

/** Wave-86 semantics: both md5-seeded ANN twins replay from a local
  * exact-integer walk of the same index pipeline. */
class Wave86Spec extends SparkSuite {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def vecs: Array[(Long, Array[Long])] =
    Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      }

  private def seeds(vs: Array[(Long, Array[Long])], salt: String)
      : Array[Array[Long]] =
    vs.sortBy { case (id, _) => md5Hex(id.toString + salt) }
      .take(16).map(_._2)

  test("sim_ivf_md5: local exact-integer IVF probe replay") {
    val vs = vecs
    val cents = seeds(vs, "#ivf")
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
    val qv = vs.find(_._1 == 0L).get._2
    val assign = vs.map { case (id, v) =>
      val ds = cents.map(c => dot(v, c))
      id -> ds.zipWithIndex.minBy { case (d, i) => (-d, i) }._2
    }.toMap
    val probe = cents.zipWithIndex.map { case (c, i) => (dot(c, qv), i) }
      .sortBy { case (d, i) => (-d, i) }.take(4).map(_._2).toSet
    val expect = vs.filter(v => v._1 != 0L && probe(assign(v._1)))
      .map { case (id, v) => (id, dot(v, qv).toLong) }
      .sortBy { case (id, d) => (-d, id) }.take(10)
    val out = SparkEntry.queries("sim_ivf_md5")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === expect.toSeq)
  }

  test("sim_pq_md5: local exact-integer PQ ADC replay") {
    val vs = vecs
    val sd = seeds(vs, "#pq")
    def l2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    val cw = Array.tabulate(8)(s => sd.map(_.slice(8 * s, 8 * s + 8)))
    val qv = vs.find(_._1 == 0L).get._2
    val qdt = Array.tabulate(8) { s =>
      val qs = qv.slice(8 * s, 8 * s + 8)
      cw(s).map(c => l2(qs, c))
    }
    val expect = vs.filter(_._1 != 0L).map { case (id, v) =>
      val adist = (0 until 8).map { s =>
        val vsub = v.slice(8 * s, 8 * s + 8)
        val code = cw(s).map(c => l2(vsub, c)).zipWithIndex
          .minBy { case (d, j) => (d, j) }._2
        qdt(s)(code)
      }.sum
      (id, adist.toLong)
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val out = SparkEntry.queries("sim_pq_md5")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === expect.toSeq)
  }
}
