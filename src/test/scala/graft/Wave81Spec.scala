package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-81 semantics: Haar replays from a local pyramid; the DP
  * release replays the md5-seeded discrete-Laplace draw. */
class Wave81Spec extends SparkSuite {

  test("timeseries_haar: local pyramid replay; energy decomposes variance") {
    val out = SparkEntry.queries("timeseries_haar")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("yc")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def sm(v: BigInt): BigInt = v.signum * ((2 * v.abs + 2) / 4)
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val d0 = rows.map(_._2).min
      var approx: Map[Long, BigInt] =
        rows.map(r => (r._2 - d0) -> BigInt(r._3) * 1000).toMap
      (1 to 5).foreach { lvl =>
        val ks = approx.keys.map(_ / 2).toSet.toSeq.sorted
        val next = ks.map { k =>
          val x0 = approx.getOrElse(2 * k, BigInt(0))
          val x1 = approx.getOrElse(2 * k + 1, BigInt(0))
          (k, sm(x0 + x1), sm(x0 - x1))
        }
        val energy = next.map(c => c._3 * c._3).sum
        val (nc, en) = out((tpe, lvl.toLong))
        assert(nc === ks.size.toLong, s"$tpe level $lvl coefs")
        assert(math.abs(en - energy.toDouble / 1e6) < 1e-3, s"$tpe level $lvl")
        approx = next.map(c => c._1 -> c._2).toMap
      }
      // Parseval (up to half-up rounding): total detail energy is
      // bounded by the series' centered sum of squares scale
      val totalE = (1 to 5).map(l => out((tpe, l.toLong))._2).sum
      assert(totalE > 0.0)
    }
  }

  test("privacy_dp_counts: md5-seeded draw replays; noise is integer-small") {
    val rows = SparkEntry.queries("privacy_dp_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val truth = Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def md5Long15(s2: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def g(tag: String, tpe: String): Long =
      math.floor(-math.log((md5Long15(s"dp#$tag#$tpe") + 1).toDouble /
        1152921504606846976.0)).toLong
    rows.foreach { case (tpe, eps, tn, noise, rel) =>
      assert(eps === 1.0)
      assert(tn === truth(tpe))
      assert(noise === g("a", tpe) - g("b", tpe), s"$tpe noise")
      assert(rel === tn + noise)
      // -ln(u) is Exp(1): draws beyond 50 have probability < 2e-22
      assert(math.abs(noise) < 50)
    }
    assert(rows.map(_._1).toSet === truth.keySet)
  }
}
