package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-74 semantics: the stump replays from a local threshold sweep;
  * the AMS sketch replays from local md5 signs over the tf table. */
class Wave74Spec extends SparkSuite {

  test("ml_decision_stump: local threshold-sweep replay") {
    val out = SparkEntry.queries("ml_decision_stump")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getBoolean(7)))).toMap
    assert(out.keySet === Set("len_b100", "the_hits", "tok_b10"))
    val docs = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val text = r.getString(1)
        val pos = if (r.getString(0) == "en") 1L else 0L
        val toks = text.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
        val theHits = text.toLowerCase.split("[^a-z0-9]+").count(_ == "the")
        (pos, Map(
          "len_b100" -> text.length.toLong / 100,
          "tok_b10" -> toks.toLong / 10,
          "the_hits" -> theHits.toLong))
      }
    val nn = BigInt(docs.length); val pp = BigInt(docs.map(_._1).sum)
    val baseMicro = (2 * (nn * nn - pp * pp - (nn - pp) * (nn - pp)) * 1000000
      + nn * nn) / (2 * nn * nn)
    var globalBest: Option[(BigInt, String)] = None
    val local = Seq("len_b100", "the_hits", "tok_b10").map { f =>
      val cells = docs.groupBy(_._2(f)).map { case (b, v) =>
        (b, BigInt(v.length), BigInt(v.map(_._1).sum))
      }.toSeq.sortBy(_._1)
      val sweeps = cells.inits.toSeq.reverse.tail.map { pre =>
        val b = pre.last._1
        val nl = pre.map(_._2).sum; val pl = pre.map(_._3).sum
        (b, nl, pl)
      }.filter(_._2 < nn)
      val scored = sweeps.map { case (b, nl, pl) =>
        val nr = nn - nl; val pr = pp - pl
        val a = nl * nl - pl * pl - (nl - pl) * (nl - pl)
        val bb = nr * nr - pr * pr - (nr - pr) * (nr - pr)
        val g = (2 * (a * nr + bb * nl) * 1000000 + nl * nr * nn) /
          (2 * nl * nr * nn)
        (g, b, nl, pl)
      }
      val best = scored.minBy(t => (t._1, t._2))
      if (globalBest.isEmpty || (best._1, f) < globalBest.get)
        globalBest = Some((best._1, f))
      f -> best
    }.toMap
    local.foreach { case (f, (g, b, nl, pl)) =>
      val (ob, onl, opl, ogs, ogb, ogain, _) = out(f)
      assert(ob === b.toLong, s"$f threshold")
      assert(onl === nl.toLong && opl === pl.toLong, s"$f left counts")
      assert(math.abs(ogs - g.toDouble / 1e6) < 1e-9, s"$f gini")
      assert(math.abs(ogb - baseMicro.toDouble / 1e6) < 1e-9)
      assert(math.abs(ogain - (baseMicro - g).toDouble / 1e6) < 1e-9)
      assert(ogain >= -1e-9, s"$f gain nonnegative")
    }
    val winners = out.filter(_._2._7).keySet
    assert(winners === Set(globalBest.get._2))
  }

  test("sketch_ams_f2: local md5-sign replay, estimate in range") {
    val row = SparkEntry.queries("sketch_ams_f2")(spark, sf).head
    val tf = Tables.load(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> BigInt(v.length) }
    val f2Exact = tf.values.map(v => v * v).sum
    def md5Long15(s2: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16)
    }
    val sketches = (0 to 63).map { j =>
      j -> tf.map { case (tok, c) =>
        val sign = if (md5Long15(s"$tok#$j") % 2 == 1) BigInt(1) else BigInt(-1)
        c * sign
      }.sum
    }
    val groupSums = sketches.groupBy(_._1 % 8).toSeq
      .map { case (g, v) => (v.map(x => x._2 * x._2).sum, g) }.sorted
    val g45 = groupSums(3)._1 + groupSums(4)._1
    assert(row.getLong(0) === f2Exact.toLong)
    assert(math.abs(row.getDouble(1) - g45.toDouble / 16.0) < 1e-3)
    val relMicro = (2 * (g45 - 16 * f2Exact).abs * 1000000 + 16 * f2Exact) /
      (2 * 16 * f2Exact)
    assert(math.abs(row.getDouble(2) - relMicro.toDouble / 1e6) < 1e-9)
    // 8-way median of means on a real corpus: sanity band, not theory
    assert(row.getDouble(1) > 0.0)
    assert(row.getDouble(2) < 1.0, "estimate within 2x of exact F2")
  }
}
