package graft

import java.security.MessageDigest

import graft.engine.Tables

/** Wave-85 semantics: greedy decode replays from a locally-built KN
  * bigram table; bagged stumps replay from a local per-bag CART +
  * majority-vote walk. */
class Wave85Spec extends SparkSuite {

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("text_generate_greedy: local KN-bigram greedy decode replay") {
    val texts = Tables.load(spark, sf, "documents").select("text")
      .collect().map(_.getString(0))
    val big = texts.flatMap(t => toks(t).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
      .toSeq
    val c1 = big.groupBy(_._1).map { case (w, rs) => w -> rs.map(_._3).sum }
    val n1fw = big.groupBy(_._1).map { case (w, rs) => w -> rs.size.toLong }
    val n1bw = big.groupBy(_._2).map { case (w, rs) => w -> rs.size.toLong }
    val tt = big.size.toLong
    val pn = big.map { case (w1, w2, c12) =>
      (w1, w2) -> math.round((
        math.max(c12.toDouble - 0.75, 0.0) / c1(w1) +
          (0.75 * n1fw(w1) / c1(w1)) * (n1bw(w2).toDouble / tt)) * 1e9)
    }.toMap
    var cur = "the"
    val expect = Seq.newBuilder[(Long, String, Long)]
    expect += ((0L, "the", 0L))
    for (k <- 1 to 10) {
      val (w2, p) = pn.collect { case ((w1, w2), p) if w1 == cur => (w2, p) }
        .toSeq.minBy { case (w2, p) => (-p, w2) }
      expect += ((k.toLong, w2, p))
      cur = w2
    }
    val out = SparkEntry.queries("text_generate_greedy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val exp = expect.result()
    assert(out.length === 11)
    out.zip(exp).foreach { case ((os, ot, op), (es, et, ep)) =>
      assert(os === es && ot === et, s"step $es")
      assert(math.abs(op - ep.toDouble / 1e9) < 1e-12, s"p at step $es")
    }
  }

  private def md5Bag(text: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((text + "#bag").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 8
  }

  private case class Doc(pos: Long, bag: Long, f: Map[String, Long])

  private def bestSplit(docs: Seq[Doc]): (String, Long, BigInt) = {
    val nn = BigInt(docs.length); val pp = BigInt(docs.map(_.pos).sum)
    val scored = for {
      f <- Seq("len_b100", "the_hits", "tok_b10")
      cells = docs.groupBy(_.f(f)).toSeq.sortBy(_._1)
      pre <- cells.inits.toSeq.reverse.tail
      nl = BigInt(pre.map(_._2.size).sum)
      if nl < nn
    } yield {
      val pl = BigInt(pre.map(_._2.map(_.pos).sum).sum)
      val nr = nn - nl; val pr = pp - pl
      val a = nl * nl - pl * pl - (nl - pl) * (nl - pl)
      val b2 = nr * nr - pr * pr - (nr - pr) * (nr - pr)
      val g = (2 * (a * nr + b2 * nl) * 1000000 + nl * nr * nn) /
        (2 * nl * nr * nn)
      (g, pre.last._1, f)
    }
    val w = scored.minBy(t => (t._1, t._2, t._3))
    (w._3, w._2, w._1)
  }

  test("ml_bagged_stumps: local per-bag CART + majority-vote replay") {
    val docs = Tables.load(spark, sf, "documents").select("lang", "text")
      .collect().map { r =>
        val text = r.getString(1); val tk = toks(text)
        Doc(if (r.getString(0) == "en") 1L else 0L, md5Bag(text), Map(
          "len_b100" -> text.length.toLong / 100,
          "tok_b10" -> tk.length.toLong / 10,
          "the_hits" -> tk.count(_ == "the").toLong))
      }.toSeq
    val splits = (0L to 7L).map { b =>
      val bagDocs = docs.filter(_.bag == b)
      val (f, th, g) = bestSplit(bagDocs)
      // leaf labels from the bag's own docs
      val label = bagDocs.groupBy(d => d.f(f) <= th).map { case (side, ds) =>
        side -> (ds.map(_.pos).sum * 2 > ds.size)
      }.withDefaultValue(false)
      val okb = bagDocs.count(d => label(d.f(f) <= th) == (d.pos == 1L))
      b -> ((f, th, g, label, BigInt(okb), BigInt(bagDocs.size)))
    }.toMap
    val okEns = docs.count { d =>
      val votes = (0L to 7L).count { b =>
        val (f, th, _, label, _, _) = splits(b); label(d.f(f) <= th)
      }
      (votes * 2 > 8) == (d.pos == 1L)
    }
    val n = docs.size
    val ensExp = ((2 * BigInt(okEns) * 1000000 + n) / (2 * BigInt(n)))
      .toDouble / 1e6
    val out = SparkEntry.queries("ml_bagged_stumps")(spark, sf).collect()
    assert(out.length === 8)
    out.foreach { r =>
      val b = r.getString(0).stripPrefix("bag").toLong
      val (f, th, g, _, okb, nb) = splits(b)
      assert(r.getString(1) === f, s"bag $b feature")
      assert(r.getLong(2) === th, s"bag $b threshold")
      assert(math.abs(r.getDouble(3) - g.toDouble / 1e6) < 1e-9)
      val accExp = ((2 * okb * 1000000 + nb) / (2 * nb)).toDouble / 1e6
      assert(math.abs(r.getDouble(4) - accExp) < 1e-9, s"bag $b accuracy")
      assert(math.abs(r.getDouble(5) - ensExp) < 1e-9, "ensemble accuracy")
    }
  }
}
