package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-84 semantics: the depth-2 tree replays from a local greedy
  * CART; stickiness replays from a local user-day walk. */
class Wave84Spec extends SparkSuite {

  private case class Doc(pos: Long, f: Map[String, Long])

  private def docsLocal: Array[Doc] =
    Tables.load(spark, sf, "documents").select("lang", "text").collect()
      .map { r =>
        val text = r.getString(1)
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        Doc(if (r.getString(0) == "en") 1L else 0L, Map(
          "len_b100" -> text.length.toLong / 100,
          "tok_b10" -> toks.length.toLong / 10,
          "the_hits" -> toks.count(_ == "the").toLong))
      }

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
      val b = pre.last._1
      val nr = nn - nl; val pr = pp - pl
      val a = nl * nl - pl * pl - (nl - pl) * (nl - pl)
      val bb2 = nr * nr - pr * pr - (nr - pr) * (nr - pr)
      val g = (2 * (a * nr + bb2 * nl) * 1000000 + nl * nr * nn) /
        (2 * nl * nr * nn)
      (g, b, f)
    }
    val w = scored.minBy(t => (t._1, t._2, t._3))
    (w._3, w._2, w._1)
  }

  test("ml_tree_depth2: local greedy CART replay; tree >= stump accuracy") {
    val out = SparkEntry.queries("ml_tree_depth2")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val docs = docsLocal.toSeq
    val (rf, rb, rg) = bestSplit(docs)
    val (lDocs, rDocs) = docs.partition(d => d.f(rf) <= rb)
    val (lf, lb, lg) = bestSplit(lDocs)
    val (rtf, rtb, rtg) = bestSplit(rDocs)
    val (orf, orb2, orn, orp, org2, acc) = out("root")
    assert(orf === rf && orb2 === rb)
    assert(orn === docs.length.toLong && orp === docs.map(_.pos).sum)
    assert(math.abs(org2 - rg.toDouble / 1e6) < 1e-9)
    assert(out("left")._1 === lf && out("left")._2 === lb)
    assert(out("left")._3 === lDocs.length.toLong)
    assert(math.abs(out("left")._5 - lg.toDouble / 1e6) < 1e-9)
    assert(out("right")._1 === rtf && out("right")._2 === rtb)
    assert(out("right")._3 === rDocs.length.toLong)
    assert(math.abs(out("right")._5 - rtg.toDouble / 1e6) < 1e-9)
    // accuracy: four-leaf majority vote
    val correct = Seq((lDocs, lf, lb), (rDocs, rtf, rtb)).flatMap {
      case (branch, f, b) =>
        branch.groupBy(d => d.f(f) <= b).values.map { leaf =>
          val p = leaf.map(_.pos).sum
          math.max(p, leaf.size - p)
        }
    }.sum
    val n = docs.length
    val accExp = ((2 * BigInt(correct) * 1000000 + n) / (2 * BigInt(n)))
      .toDouble / 1e6
    assert(math.abs(acc - accExp) < 1e-9)
    assert(out.values.map(_._6).toSet.size === 1, "shared accuracy column")
    // depth 2 cannot be worse than majority-at-root
    val rootMaj = math.max(docs.map(_.pos).sum, n - docs.map(_.pos).sum)
    assert(acc >= rootMaj.toDouble / n - 1e-9)
  }

  test("events_stickiness: local user-day replay; dau <= wau") {
    val out = SparkEntry.queries("events_stickiness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ud = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"),
        col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ud.groupBy(_._1).foreach { case (tpe, rows) =>
      val d0 = rows.map(_._2).min; val d1 = rows.map(_._2).max
      (d0 to d1).foreach { d =>
        val dau = rows.filter(_._2 == d).map(_._3).distinct.size.toLong
        val wau = rows.filter(r => r._2 >= d - 6 && r._2 <= d)
          .map(_._3).distinct.size.toLong
        val (od, ow, os) = out((tpe, d))
        assert(od === dau, s"$tpe day $d dau")
        assert(ow === wau, s"$tpe day $d wau")
        val exp = if (wau == 0) 0.0
          else ((2 * BigInt(dau) * 1000000 + wau) / (2 * BigInt(wau)))
            .toDouble / 1e6
        assert(math.abs(os - exp) < 1e-9)
        assert(dau <= wau)
      }
    }
  }
}
