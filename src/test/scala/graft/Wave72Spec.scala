package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-72 semantics: eta-squared replays from local exact moments;
  * n-gram coverage replays from local split gram sets. */
class Wave72Spec extends SparkSuite {

  test("profile_eta_squared: local exact-moment replay, values in [0,1]") {
    val rows = SparkEntry.queries("profile_eta_squared")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === Set("dow", "event_type", "hour"))
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("pmod(floor(unix_timestamp(ts) / 3600), 24)").cast("long").as("hour"),
        expr("cast(floor(unix_timestamp(ts) / 86400) % 7 as long)").as("dow"),
        expr("cast(round(value * 100) as long)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def eta(key: ((String, Long, Long, Long)) => String): Double = {
      val groups = ev.groupBy(key)
      val nn = BigInt(ev.length)
      val ss = BigInt(ev.map(_._4).sum)
      val qq = ev.map(e => BigInt(e._4) * e._4).sum
      val aMicro = groups.values.map { g =>
        val sv = BigInt(g.map(_._4).sum); val n = BigInt(g.length)
        (2 * sv * sv * 1000000 + n) / (2 * n)
      }.sum
      val num = nn * aMicro - ss * ss * 1000000
      val den = nn * qq * 1000000 - ss * ss * 1000000
      ((2 * num + den) / (2 * den)).toDouble / 1e6
    }
    assert(math.abs(rows("event_type") - eta(_._1)) < 1e-9)
    assert(math.abs(rows("hour") - eta(_._2.toString)) < 1e-9)
    assert(math.abs(rows("dow") - eta(_._3.toString)) < 1e-9)
    rows.values.foreach(v => assert(v >= -1e-6 && v <= 1.0 + 1e-6))
  }

  test("eval_ngram_coverage: local split gram-set replay, monotone in n") {
    val rows = SparkEntry.queries("eval_ngram_coverage")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .map { tx =>
        val b = java.lang.Long.parseLong(md5hex(tx).substring(0, 15), 16) % 100
        val split = if (b <= 97) "train" else if (b == 98) "val" else "test"
        (split, tx.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      }.filter(d => d._1 == "train" || d._1 == "val")
    (1 to 3).foreach { n =>
      def setOf(split: String) = docs.filter(_._1 == split)
        .flatMap { case (_, tk) =>
          if (tk.length >= n) tk.sliding(n).map(_.mkString(" ")).toSeq else Seq.empty
        }.toSet
      val valG = setOf("val"); val trainG = setOf("train")
      val cov = valG.count(trainG.contains).toLong
      val (nv, nc, c) = rows(n.toLong)
      assert(nv === valG.size.toLong, s"n=$n val grams")
      assert(nc === cov, s"n=$n covered")
      assert(math.abs(c - ((2 * cov * 1000000L + nv) / (2 * nv)) / 1e6) < 1e-9)
    }
    // coverage cannot rise with n
    assert(rows(1L)._3 >= rows(2L)._3 - 1e-9 && rows(2L)._3 >= rows(3L)._3 - 1e-9)
  }
}
