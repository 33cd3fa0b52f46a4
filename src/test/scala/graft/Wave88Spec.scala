package graft

import java.security.MessageDigest

import graft.engine.Tables

/** Wave-87/88 semantics: batched top-k replays from a local brute
  * force; the privacy trio replays from local exact walks. */
class Wave88Spec extends SparkSuite {

  test("sim_topk_batch: local per-query brute-force replay") {
    val vs = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val out = SparkEntry.queries("sim_topk_batch")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length === 80)
    for (qid <- 0L to 7L) {
      val qv = vs.find(_._1 == qid).get._2
      val expect = vs.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, BigDecimal(cos(v, qv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      val got = out.filter(_._1 == qid).sortBy(_._4)
      got.zip(expect).zipWithIndex.foreach { case (((q, id, c, rn), (eid, ec)), k) =>
        assert(rn === k + 1L)
        assert(id === eid, s"qid $qid rank ${k + 1}")
        assert(math.abs(c - ec) < 1e-9)
      }
    }
  }

  test("pii_scan: local exact column-audit replay") {
    val rows = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_mktsegment").collect()
    val colsv: Map[String, Seq[String]] = Map(
      "c_custkey" -> rows.map(_.getLong(0).toString).toSeq,
      "c_name" -> rows.map(_.getString(1)).toSeq,
      "c_mktsegment" -> rows.map(_.getString(2)).toSeq)
    val out = SparkEntry.queries("pii_scan")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    colsv.foreach { case (c, vs) =>
      val (n, nd, dr, cls) = out(c)
      assert(n === vs.size.toLong)
      assert(nd === vs.distinct.size.toLong)
      val digits = vs.map(_.count(_.isDigit)).sum.toLong
      val chars = vs.map(_.length).sum.toLong
      val drExp = BigDecimal(digits.toDouble / chars)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(dr - drExp) < 1e-9, c)
      val clsExp =
        if (digits == chars) "numeric_id"
        else if (vs.distinct.size * 20 >= vs.size * 19) "identifier"
        else if (vs.distinct.size <= 10) "categorical"
        else "free_text"
      assert(cls === clsExp, c)
    }
    assert(out("c_custkey")._4 === "numeric_id")
    assert(out("c_name")._4 === "identifier")
    assert(out("c_mktsegment")._4 === "categorical")
  }

  test("pii_pseudonymize: deterministic, masked, key-free") {
    val out = SparkEntry.queries("pii_pseudonymize")(spark, sf).collect()
    val cust = Tables.load(spark, sf, "customer").collect()
    assert(out.length === cust.length)
    // pseudonyms are unique and reproducible from the key
    def pseudo(k: Long): String =
      MessageDigest.getInstance("MD5")
        .digest(s"cust#$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val ps = out.map(_.getString(0))
    assert(ps.distinct.length === ps.length)
    val expected = cust.map(r => pseudo(r.getLong(0))).toSet
    assert(ps.toSet === expected)
    // no digits survive in the masked name; buckets are coarse
    out.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit))
      assert(r.getLong(4) % 100 === 0L)
    }
    // output is ordered by pseudonym (no key-order leak)
    assert(ps.toSeq === ps.toSeq.sorted)
  }

  test("privacy_k_anonymity: local class-size histogram replay") {
    val cls = Tables.load(spark, sf, "customer")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .groupBy(r => (r.getInt(0), r.getString(1),
        (math.floor(r.getDouble(2) / 1000) * 1000).toLong))
      .map(_._2.length)
    val hist = cls.groupBy(identity).map { case (sz, xs) =>
      sz.toLong -> ((xs.size.toLong, (sz.toLong * xs.size))) }
    val out = SparkEntry.queries("privacy_k_anonymity")(spark, sf).collect()
    assert(out.length === hist.size)
    out.foreach { r =>
      val (nc, nr) = hist(r.getLong(0))
      assert(r.getLong(1) === nc)
      assert(r.getLong(2) === nr)
      assert(r.getBoolean(3) === (r.getLong(0) < 5))
    }
    // the histogram covers every customer exactly once
    assert(out.map(_.getLong(2)).sum === cls.sum.toLong)
  }
}
