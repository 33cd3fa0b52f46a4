package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-66 semantics: HDR quantiles bracket the exact percentiles
  * within the bucket's 12.5% relative-error bound; script shares
  * replay from a local codepoint scan. */
class Wave66Spec extends SparkSuite {

  test("profile_hdr_latency: bucket quantiles bracket exact percentiles") {
    val rows = SparkEntry.queries("profile_hdr_latency")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("p50", "p90", "p99", "p999"))
    val cents = Tables.load(spark, sf, "events")
      .select(expr("cast(round(value * 100) as long)").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0).sorted
    def exactQ(num: Long, den: Long): Long = {
      val idx = ((cents.length * num + den - 1) / den - 1).toInt
      cents(math.max(0, idx))
    }
    Seq(("p50", 50L, 100L), ("p90", 90L, 100L), ("p99", 99L, 100L),
      ("p999", 999L, 1000L)).foreach { case (label, num, den) =>
      val lo = rows(label)
      val exact = exactQ(num, den)
      // the reported bucket lower bound must be <= exact value, and the
      // bucket's upper bound (lo * 9/8 rounded up) must be > exact
      assert(lo <= exact, s"$label: lo=$lo exact=$exact")
      assert(exact < (lo * 9 + 7) / 8 + 1, s"$label: exact=$exact above bucket of $lo")
      // monotone across labels
    }
    assert(rows("p50") <= rows("p90") && rows("p90") <= rows("p99") &&
      rows("p99") <= rows("p999"))
  }

  test("text_script_mix: shares replay from a local codepoint scan") {
    val rows = SparkEntry.queries("text_script_mix")(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def cls(cp: Int): String =
      if ((cp >= 65 && cp <= 90) || (cp >= 97 && cp <= 122)) "latin"
      else if (cp >= 19968 && cp <= 40959) "han"
      else if (cp >= 48 && cp <= 57) "digit"
      else if (cp == 32) "space" else "other"
    val perLang = docs.groupBy(_._1).map { case (lang, ds) =>
      val perDoc = ds.map { case (_, text) =>
        val cs = text.map(ch => cls(ch.toInt))
        (cs.length.toLong, cs.count(_ == "latin").toLong,
          cs.count(_ == "han").toLong, cs.count(_ == "digit").toLong,
          cs.count(_ == "space").toLong)
      }
      val nc = perDoc.map(_._1).sum
      def micro(x: Long) = (2 * x * 1000000L + nc) / (2 * nc)
      lang -> (ds.length.toLong, micro(perDoc.map(_._2).sum),
        micro(perDoc.map(_._3).sum), micro(perDoc.map(_._4).sum),
        micro(perDoc.map(_._5).sum),
        perDoc.count(d => d._3 * 2 > d._1).toLong)
    }
    rows.foreach { r =>
      val e = perLang(r.getString(0))
      assert(r.getLong(1) === e._1)
      assert(r.getLong(2) === e._2, s"${r.getString(0)} latin")
      assert(r.getLong(3) === e._3, s"${r.getString(0)} han")
      assert(r.getLong(4) === e._4)
      assert(r.getLong(5) === e._5)
      assert(r.getLong(6) === e._6, s"${r.getString(0)} majority han")
    }
    // shares are well-formed micro fractions (the fixture corpus is
    // latin-script for every lang label, zh included — which is exactly
    // the mislabeling this profile exists to surface)
    rows.foreach { r =>
      (2 to 5).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= 1000000L))
    }
  }
}
