package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-75 semantics: DoReMi weights replay from local tf tables with
  * the addend rounding discipline; AP replays from a local ranked
  * walk. */
class Wave75Spec extends SparkSuite {

  private def docRows =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def toks(t: String): Array[String] =
    t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("corpus_doremi: local KL + softmax replay; weights sum to ~1") {
    val out = SparkEntry.queries("corpus_doremi")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5)))).toMap
    val terms = docRows.flatMap(d => toks(d._4).map(tok => (d._3, tok)))
    val tfS = terms.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val totS = terms.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val tfC = terms.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val tC = terms.length.toLong
    assert(out.keySet === totS.keySet)
    def round9(v: Double): JBD =
      BigDecimal(v).bigDecimal.setScale(9, RoundingMode.HALF_UP)
    val kls = totS.keys.map { src =>
      val sum = tfS.filter(_._1._1 == src).foldLeft(new JBD(0)) {
        case (acc, ((_, tok), c)) =>
          val p = c.toDouble / totS(src)
          val q = tfC(tok).toDouble / tC
          acc.add(round9(p * math.log(p / q)))
      }
      src -> sum.setScale(6, RoundingMode.HALF_UP).doubleValue
    }.toMap
    val wNano = kls.map { case (src, kl) =>
      src -> BigInt(math.round(totS(src).toDouble / tC * math.exp(kl) * 1e9))
    }
    val wTot = wNano.values.sum
    var weightSum = 0.0
    var budgetSum = 0L
    out.foreach { case (src, (nTok, share, excess, weight, budget)) =>
      assert(nTok === totS(src))
      assert(math.abs(share -
        ((2 * BigInt(totS(src)) * 1000000 + tC) / (2 * BigInt(tC))).toDouble / 1e6)
        < 1e-9)
      assert(math.abs(excess - kls(src)) < 1e-9, s"$src kl")
      assert(excess >= -1e-9, s"$src KL nonnegative")
      val wm = (2 * wNano(src) * 1000000 + wTot) / (2 * wTot)
      assert(math.abs(weight - wm.toDouble / 1e6) < 1e-9, s"$src weight")
      assert(budget === (wm * tC / 1000000).toLong, s"$src budget")
      weightSum += weight; budgetSum += budget
    }
    assert(math.abs(weightSum - 1.0) < 1e-4, "softmax normalizes")
    assert(math.abs(budgetSum - tC) <= out.size.toLong, "budget conserves total")
  }

  test("eval_average_precision: local ranked-walk replay, ap in [0,1]") {
    val row = SparkEntry.queries("eval_average_precision")(spark, sf).head
    val stop = Set("the", "and", "of", "to", "in", "is", "a", "that")
    val scored = docRows.map { case (id, lang, _, text) =>
      (id, if (lang == "en") 1L else 0L,
        toks(text).distinct.count(stop.contains).toLong)
    }.sortBy { case (id, _, sc) => (-sc, id) }
    var cum = 0L; var apSum = BigInt(0)
    var p10 = 0L; var p100 = 0L
    scored.zipWithIndex.foreach { case ((_, rel, _), i) =>
      val k = i + 1L
      cum += rel
      if (rel == 1) apSum += (2 * BigInt(cum) * 1000000000L + k) / (2 * k)
      if (k == 10) p10 = cum
      if (k == 100) p100 = cum
    }
    val nRel = scored.map(_._2).sum
    assert(row.getLong(0) === scored.length.toLong)
    assert(row.getLong(1) === nRel)
    val ap = ((2 * apSum + nRel) / (2 * BigInt(nRel))).toDouble / 1e9
    assert(math.abs(row.getDouble(2) - ap) < 1e-9)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0 + 1e-9)
    assert(math.abs(row.getDouble(3) - p10 / 10.0) < 1e-9)
    assert(math.abs(row.getDouble(4) - p100 / 100.0) < 1e-9)
  }
}
