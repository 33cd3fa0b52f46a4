package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-89 semantics: ACF replays from a local exact-integer walk of
  * the zero-filled daily series; the A/B t-test replays from a local
  * per-user cent walk. */
class Wave89Spec extends SparkSuite {

  test("timeseries_acf: local exact-integer replay; acf(0) would be 1") {
    val rows = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("timeseries_acf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val byDay = rs.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
      val d0 = byDay.keys.min; val d1 = byDay.keys.max
      val xs = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      val n = BigInt(xs.length)
      val sSum = xs.map(BigInt(_)).sum
      val q = xs.map(x => BigInt(x) * x).sum
      val den = n * n * q - n * sSum * sSum
      for (k <- 1 to 7) {
        val head = xs.dropRight(k); val tail = xs.drop(k)
        val p = head.zip(tail).map { case (a, b) => BigInt(a) * b }.sum
        val h = head.map(BigInt(_)).sum; val tt = tail.map(BigInt(_)).sum
        val num = n * n * p - n * sSum * (h + tt) + (n - k) * sSum * sSum
        val micro = num.signum * ((2 * num.abs * 1000000 + den) / (2 * den))
        assert(math.abs(out((tpe, k.toLong)) - micro.toDouble / 1e6) < 1e-9,
          s"$tpe lag $k")
      }
      // sanity: |acf| <= 1 for every reported lag
      for (k <- 1 to 7)
        assert(math.abs(out((tpe, k.toLong))) <= 1.0 + 1e-9)
    }
  }

  test("events_abtest: local per-user Welch replay") {
    val rows = Tables.load(spark, sf, "events")
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cents = rows.groupBy(_._1).map { case (u, es) =>
      u -> es.filter(_._2 == "purchase")
        .map(e => math.round(e._3 * 100)).sum
    }
    def arm(u: Long): Int = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"ab#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 2).toInt
    }
    val groups = cents.groupBy { case (u, _) => arm(u) }
      .map { case (a, m) => a -> m.values.toSeq }
    def stats(vs: Seq[Long]) = {
      val n = vs.size.toLong
      val sSum = vs.map(BigInt(_)).sum
      val q = vs.map(v => BigInt(v) * v).sum
      (n, sSum, q)
    }
    val (n0, s0, q0) = stats(groups(0)); val (n1, s1, q1) = stats(groups(1))
    def mean(sSum: BigInt, n: Long) = sSum.toDouble / n / 100.0
    def varc(n: Long, sSum: BigInt, q: BigInt) =
      (BigInt(n) * q - sSum * sSum).toDouble / (n * (n - 1)).toDouble
    val tExp = (mean(s1, n1) - mean(s0, n0)) /
      (math.sqrt(varc(n1, s1, q1) / n1 + varc(n0, s0, q0) / n0) / 100.0)
    val r = SparkEntry.queries("events_abtest")(spark, sf).collect()(0)
    assert(r.getLong(0) === n0 && r.getLong(1) === n1)
    assert(math.abs(r.getDouble(2) - mean(s0, n0)) < 1e-6)
    assert(math.abs(r.getDouble(3) - mean(s1, n1)) < 1e-6)
    assert(math.abs(r.getDouble(5) - tExp) < 1e-5)
    assert(r.getBoolean(6) === (math.abs(r.getDouble(5)) >= 1.96))
  }
}
