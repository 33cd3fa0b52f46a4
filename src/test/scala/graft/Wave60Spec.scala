package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-60 semantics: modularity contributions replay from a local
  * weighted-graph scan and satisfy Newman's identities; entropy stats
  * replay from a local unigram-entropy computation. */
class Wave60Spec extends SparkSuite {

  test("graph_modularity: local replay + identity sum(a_c) = 2m") {
    val rows = SparkEntry.queries("graph_modularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nat = Tables.load(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val byC = edges.groupBy(_._1)
    val pairW = byC.values.flatMap { es =>
      val ps = es.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val m = pairW.values.sum
    val aC = pairW.toSeq.flatMap { case ((p1, p2), w) =>
      Seq(nat(p1) -> w, nat(p2) -> w)
    }.groupBy(_._1).map { case (n, v) => n -> v.map(_._2).sum }
    val eC = pairW.toSeq.filter { case ((p1, p2), _) => nat(p1) == nat(p2) }
      .groupBy { case ((p1, _), _) => nat(p1) }
      .map { case (n, v) => n -> v.map(_._2).sum }
    rows.foreach { r =>
      val n = r.getAs[Number](0).longValue
      assert(r.getLong(1) === eC.getOrElse(n, 0L), s"e_c for nation $n")
      assert(r.getLong(2) === aC(n), s"a_c for nation $n")
      val num = BigInt(eC.getOrElse(n, 0L)) * 4 * m - BigInt(aC(n)) * aC(n)
      val den = BigInt(4) * m * m
      val mag = (2 * num.abs * 1000000 + den) / (2 * den)
      val qm = (if (num < 0) -mag else mag).toLong
      assert(math.abs(r.getDouble(3) - qm / 1e6) < 1e-9, s"q for nation $n")
    }
    // identity: degree masses sum to twice the total edge weight
    assert(rows.map(_.getLong(2)).sum === 2 * m)
    // modularity is bounded: |Q| <= 1
    val q = rows.map(_.getDouble(3)).sum
    assert(q >= -1.0 - 1e-6 && q <= 1.0 + 1e-6)
  }

  test("text_entropy_compress: per-source stats replay from local entropies") {
    val rows = SparkEntry.queries("text_entropy_compress")(spark, sf).collect()
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val hBySource = docs.map { case (src, text) =>
      val counts = text.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val scl = counts.map(c => c * lnq(c)).sum
      src -> (lnq(n) - (2 * scl + n) / (2 * n))
    }.groupBy(_._1).map { case (s2, v) => s2 -> v.map(_._2) }
    rows.foreach { r =>
      val hs = hBySource(r.getString(0)).toSeq
      assert(r.getLong(1) === hs.length.toLong)
      val mean = (2 * hs.sum + hs.length) / (2L * hs.length)
      assert(math.abs(r.getDouble(2) - mean / 1e9) < 1e-9, s"${r.getString(0)} mean")
      assert(math.abs(r.getDouble(3) - hs.min / 1e9) < 1e-9)
      assert(math.abs(r.getDouble(4) - hs.max / 1e9) < 1e-9)
      assert(r.getLong(5) === hs.count(_ < 1500000000L).toLong)
      assert(r.getLong(6) === hs.count(_ > 4200000000L).toLong)
    }
  }
}
