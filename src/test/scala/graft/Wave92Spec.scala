package graft

import graft.engine.Tables

/** Wave-92 semantics: frame sampling and MRR replay from local exact
  * walks. */
class Wave92Spec extends SparkSuite {

  test("multimodal_framesample: local uniform-k replay; indices in range") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).length.toLong / 256))
      .filter(_._2 > 0)
    val expect = docs.flatMap { case (id, nf) =>
      val k = math.min(8L, nf)
      (0L until k).map(i => (id, nf, k, i, i * nf / k))
    }.sortBy(t => (t._1, t._4))
    val out = SparkEntry.queries("multimodal_framesample")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === expect.toSeq)
    // indices strictly increase within a doc and stay inside the stream
    out.groupBy(_._1).values.foreach { fs =>
      val idx = fs.sortBy(_._4).map(_._5)
      assert(idx.zip(idx.tail).forall { case (a, b) => a < b }, fs.head._1)
      assert(idx.forall(i => i >= 0 && i < fs.head._2))
    }
  }

  test("eval_mrr: local reciprocal-rank replay") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2) == "en",
        r.getString(3).length.toLong))
    val perQ = docs.groupBy(_._2).map { case (src, ds) =>
      val ranked = ds.sortBy(d => (-d._4, d._1))
      val firstRk = ranked.zipWithIndex.collectFirst {
        case ((_, _, true, _), i) => i + 1L }
      val rr = firstRk.map(rk => (2 * 1000000L + rk) / (2 * rk)).getOrElse(0L)
      src -> ((ds.length.toLong, ds.count(_._3).toLong,
        firstRk.getOrElse(0L), rr))
    }
    val n = perQ.size
    val mrrNano = (2 * perQ.values.map(_._4).sum * 1000000L + n) / (2L * n)
    val out = SparkEntry.queries("eval_mrr")(spark, sf).collect()
    assert(out.length === n)
    out.foreach { r =>
      val (nd, nr, frk, rr) = perQ(r.getString(0))
      assert(r.getLong(1) === nd && r.getLong(2) === nr)
      assert(r.getLong(3) === frk)
      assert(math.abs(r.getDouble(4) - rr.toDouble / 1e6) < 1e-12)
      assert(math.abs(r.getDouble(5) - mrrNano.toDouble / 1e12) < 1e-15)
    }
  }
}
