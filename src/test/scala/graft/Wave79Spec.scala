package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-79 semantics: held-out KN perplexity replays from local split
  * LMs; Theil-Sen replays from the local pair lattice. */
class Wave79Spec extends SparkSuite {

  private def md5hex(s2: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(tx: String): String = {
    val b = java.lang.Long.parseLong(md5hex(tx).substring(0, 15), 16) % 100
    if (b <= 97) "train" else if (b == 98) "val" else "test"
  }

  test("eval_perplexity_kn: local train-LM replay; ppl = exp(ce) > 1") {
    val out = SparkEntry.queries("eval_perplexity_kn")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .map { case (src, tx) =>
        (src, splitOf(tx),
          tx.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      }
    def bigrams(tk: Array[String]) =
      if (tk.length >= 2) tk.sliding(2).map(a => (a(0), a(1))).toSeq else Seq.empty
    val trainBi = docs.filter(_._2 == "train").flatMap(d => bigrams(d._3))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = trainBi.groupBy(_._1._1)
      .map { case (w, m) => w -> ((m.values.sum, m.size.toLong)) }
    val n1bw = trainBi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tt = trainBi.size.toLong
    val v = (trainBi.keys.map(_._1) ++ trainBi.keys.map(_._2)).toSet.size.toLong
    val bySource = docs.filter(_._2 == "val").groupBy(_._1)
    assert(out.keySet === bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val valBi = rows.flatMap(d => bigrams(d._3))
      var lp = BigInt(0); var oov = 0L
      valBi.foreach { case (w1, w2) =>
        val pcS = (n1bw.getOrElse(w2, 0L).toDouble + 1.0) / (tt + v)
        val p = c1.get(w1) match {
          case Some((cw1, fw)) =>
            trainBi.get((w1, w2)) match {
              case Some(c12) =>
                math.max(c12.toDouble - 0.75, 0.0) / cw1 + (0.75 * fw / cw1) * pcS
              case None => (0.75 * fw / cw1) * pcS
            }
          case None => oov += 1; pcS
        }
        lp += BigInt(math.round(-math.log(p) * 1e9))
      }
      val n = valBi.length.toLong
      val ce = math.rint(((2 * lp + n) / (2 * BigInt(n))).toDouble / 1e9 * 1e6) / 1e6
      val (on, ooov, oce, oppl) = out(src)
      assert(on === n, s"$src bigrams")
      assert(ooov === oov, s"$src oov histories")
      assert(math.abs(oce - ce) < 1e-6, s"$src ce")
      assert(math.abs(oppl - math.rint(math.exp(ce) * 1e4) / 1e4) < 1e-3, s"$src ppl")
      assert(oce > 0.0 && oppl > 1.0)
    }
  }

  test("profile_theil_sen: local pair-lattice replay; sign agrees with MK") {
    val out = SparkEntry.queries("profile_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val pts = rows.sortBy(_._2).map(r => (BigInt(r._2), BigInt(r._3)))
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield {
        val dx = pts(j)._1 - pts(i)._1; val dy = pts(j)._2 - pts(i)._2
        dy.signum * ((2 * dy.abs * 1000000 + dx) / (2 * dx))
      }).sorted
      val np = slopes.size
      val mids = Seq((np + 1) / 2, (np + 2) / 2).distinct.map(k => slopes(k - 1))
      val med = mids.map(_.toDouble).sum / mids.size / 1e6
      val (onp, osl) = out(tpe)
      assert(onp === np.toLong, s"$tpe pairs")
      assert(math.abs(osl - med) < 1e-9, s"$tpe slope")
    }
    assert(out.keySet === daily.map(_._1).toSet)
  }
}
