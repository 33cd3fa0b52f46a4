package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-65 semantics: fightin'-words scores replay from a local
  * Dirichlet log-odds computation; the Hill estimate replays from a
  * local order-statistics scan. */
class Wave65Spec extends SparkSuite {

  private def lnq(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong

  test("text_fightin_words: local Dirichlet log-odds replay") {
    val rows = SparkEntry.queries("text_fightin_words")(spark, sf).collect()
    assert(rows.length === 30)
    val docs = Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0) == "en",
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    docs.foreach { case (en, ws) =>
      ws.foreach { w =>
        val (a, b) = counts.getOrElse(w, (0L, 0L))
        counts(w) = if (en) (a + 1, b) else (a, b + 1)
      }
    }
    val ta = counts.values.map(_._1).sum
    val tb = counts.values.map(_._2).sum
    val v = counts.size.toLong
    val scored = counts.toSeq.map { case (w, (a, b)) =>
      val delta = (lnq(a + 1) - lnq(ta + v - a - 1)) -
        (lnq(b + 1) - lnq(tb + v - b - 1))
      val z = BigDecimal((delta / 1e9) /
        math.sqrt(1.0 / (a + 1) + 1.0 / (b + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (w, a, b, delta, z)
    }
    val top = scored.sortBy(t => (-t._5, t._1)).take(15).map(t => ("en", t))
    val bot = scored.sortBy(t => (t._5, t._1)).take(15).map(t => ("other", t))
    val expected = (top ++ bot).sortBy { case (_, t) => (-t._5, t._1) }
    rows.zip(expected).foreach { case (r, (side, (w, a, b, delta, z))) =>
      assert(r.getString(0) === side, s"$w side")
      assert(r.getString(1) === w)
      assert(r.getLong(2) === a && r.getLong(3) === b)
      assert(math.abs(r.getDouble(4) - delta / 1e9) < 1e-9)
      assert(math.abs(r.getDouble(5) - z) < 1e-9, s"$w z")
    }
  }

  test("profile_tail_hill: local order-statistics replay") {
    val rows = SparkEntry.queries("profile_tail_hill")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set(50, 200))
    val cents = Tables.load(spark, sf, "events")
      .select(expr("cast(round(value * 100) as long)").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0).sorted(Ordering[Long].reverse)
    Seq(50, 200).foreach { k =>
      val top = cents.take(k + 1).map(lnq)
      val lnK = top.min
      val used = top.count(_ > lnK).toLong
      val s = top.filter(_ > lnK).map(_ - lnK).sum
      val alphaMilli = (2L * k * 1000000000000L + s) / (2 * s)
      assert(rows(k)._1 === used, s"k=$k used")
      assert(math.abs(rows(k)._2 - alphaMilli / 1e3) < 1e-9, s"k=$k alpha")
      assert(rows(k)._2 > 0)
    }
  }
}
