package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-55 semantics: the Markov removal-effect orbit replays exactly
  * from a local integer simulation of the same chain; Naive Bayes
  * predictions replay exactly from a local integer scorer. */
class Wave55Spec extends SparkSuite {

  test("events_attribution_markov: exact local replay of the integer orbit") {
    val rows = SparkEntry.queries("events_attribution_markov")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    // rebuild journeys locally
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val journeys = ev.groupBy(_._1).values.map { es =>
      val ordered = es.sortBy(e => (e._4, e._2)).map(_._3)
      val cut = ordered.indexOf("purchase")
      val pre = if (cut >= 0) ordered.take(cut) else ordered
      val states = ("start" +: pre) :+ (if (cut >= 0) "conv" else "null")
      states
    }.toSeq
    val transCount = journeys.flatMap(s => s.zip(s.tail))
      .groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    val rowTot = transCount.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val ep = transCount.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowTot(a) }
    val channels = rowTot.keySet - "start"
    def absorb(tag: String): Long = {
      val edges = ep.filter { case ((a, b), _) => a != tag && b != tag }
      val states = edges.keys.map(_._1).toSet
      var v = states.map(_ -> 0L).toMap
      for (_ <- 1 to 14) {
        v = states.map { s =>
          val acc = edges.collect { case ((a, b), p) if a == s =>
            p * (if (b == "conv") 1000000L else v.getOrElse(b, 0L))
          }.sum
          s -> acc / 1000000L
        }.toMap
      }
      v("start")
    }
    val pb = absorb("none")
    assert(pb > 0)
    val res = channels.map { c =>
      val pr = absorb(c)
      val re = (2 * (pb - pr) * 1000000L + pb) / (2 * pb)
      c -> (pb, pr, re)
    }.toMap
    val tt = res.values.map(_._3).sum
    res.foreach { case (c, (b, r, re)) =>
      val (gb, gr, gre, gsh) = rows(c)
      assert(math.abs(gb - b / 1e6) < 1e-9, s"$c base")
      assert(math.abs(gr - r / 1e6) < 1e-9, s"$c removed")
      assert(math.abs(gre - re / 1e6) < 1e-9, s"$c effect")
      val sh = if (tt == 0) 0L else (2 * re * 1000000L + tt) / (2 * tt)
      assert(math.abs(gsh - sh / 1e6) < 1e-9, s"$c share")
      assert(r <= b, s"$c removal cannot raise conversion")
    }
    // shares ~sum to 1 (half-up rounding slack)
    val shareSum = rows.values.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < channels.size * 1e-6 + 1e-9)
  }

  test("ml_naive_bayes: exact local replay of the integer scorer") {
    val got = SparkEntry.queries("ml_naive_bayes")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq))
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    val langs = docs.map(_._2).distinct.sorted
    val nDocs = docs.length.toLong
    val ltc = docs.flatMap(d => d._3.map(w => (d._2, w)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val langTot = ltc.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocab = ltc.keys.map(_._2).toSet.size.toLong
    val nl = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val expected = docs.map { case (_, actual, ws) =>
      val best = langs.map { l =>
        val prior = lnq(nl(l)) - lnq(nDocs)
        val den = lnq(langTot.getOrElse(l, 0L) + vocab)
        val p2 = ws.map(w => lnq(ltc.getOrElse((l, w), 0L) + 1)).sum
        val score = prior + p2 - ws.length * den
        (l, score)
      }.minBy { case (l, sc) => (-sc, l) }._1
      (actual, best)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expected,
      s"confusion mismatch: got=$got expected=$expected")
    assert(got.values.sum === nDocs)
  }
}
