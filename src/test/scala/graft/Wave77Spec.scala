package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-77 semantics: OLS replays from a local exact Cramer solve;
  * Gumbel replays from local block maxima. */
class Wave77Spec extends SparkSuite {

  test("ml_ols_cramer: local centered-moment Cramer replay; r2 in [0,1]") {
    val row = SparkEntry.queries("ml_ols_cramer")(spark, sf).head
    val li = Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"), sum("l_quantity").cast("long").as("x2"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"),
        round(col("o_totalprice")).cast("long").as("y"))
      .join(li, "l_orderkey")
      .select("y", "x1", "x2").collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(o.length)
    def mean1000(s: BigInt) = (2 * s * 1000 + n) / (2 * n)
    val m1 = mean1000(o.map(_._2).sum)
    val m2 = mean1000(o.map(_._3).sum)
    val my = mean1000(o.map(_._1).sum)
    var s11, s12, s22, s1y, s2y, syy = BigInt(0)
    o.foreach { case (y, x1, x2) =>
      val d1 = x1 * 1000 - m1; val d2 = x2 * 1000 - m2; val dy = y * 1000 - my
      s11 += d1 * d1; s12 += d1 * d2; s22 += d2 * d2
      s1y += d1 * dy; s2y += d2 * dy; syy += dy * dy
    }
    val det = s11 * s22 - s12 * s12
    def microSM(num: BigInt): BigInt =
      if (det == 0) BigInt(0)
      else {
        val mag = (2 * num.abs * 1000000 + det) / (2 * det)
        if (num < 0) -mag else mag
      }
    val b1m = microSM(s1y * s22 - s2y * s12)
    val b2m = microSM(s2y * s11 - s1y * s12)
    val b0n = my * 1000000 - b1m * m1 - b2m * m2
    val sse = o.map { case (y, x1, x2) =>
      val rn = y * BigInt(1000000000L) - b0n - b1m * x1 * 1000 - b2m * x2 * 1000
      val rm = rn.signum * ((2 * rn.abs + 1000) / 2000)
      rm * rm
    }.sum
    val r2Micro = BigInt(1000000) - (2 * sse + syy) / (2 * syy)
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - b0n.toDouble / 1e9) < 1e-6, "b0")
    assert(math.abs(row.getDouble(2) - b1m.toDouble / 1e6) < 1e-9, "b1")
    assert(math.abs(row.getDouble(3) - b2m.toDouble / 1e6) < 1e-9, "b2")
    assert(math.abs(row.getDouble(4) - r2Micro.toDouble / 1e6) < 1e-9, "r2")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0 + 1e-9)
  }

  test("profile_extreme_gumbel: local block-maxima replay; rl99 above mean") {
    val out = SparkEntry.queries("profile_extreme_gumbel")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val daily = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .groupBy("event_type", "day").agg(max("c").as("mx")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.map(r => BigInt(r._2))
      val nd = BigInt(xs.length)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val meanMicro = (2 * sx * 1000000 + nd) / (2 * nd)
      val s2Micro = (2 * (nd * sxx - sx * sx) * 1000000 + nd * (nd - 1)) /
        (2 * nd * (nd - 1))
      val sigma = math.sqrt(s2Micro.toDouble / 1e6) * 0.7796968012336609
      val mu = meanMicro.toDouble / 1e6 - 0.5772156649015329 * sigma
      val rl = mu + 4.600149226776579 * sigma
      val (n, mm, gs, gl, r99) = out(tpe)
      assert(n === xs.length.toLong)
      assert(math.abs(mm - math.rint(meanMicro.toDouble / 1e6 * 1e6) / 1e6) < 1e-5)
      assert(math.abs(gs - sigma) < 1e-5, s"$tpe sigma")
      assert(math.abs(gl - mu) < 1e-5, s"$tpe mu")
      assert(math.abs(r99 - rl) < 1e-5, s"$tpe rl99")
      assert(r99 > mm, s"$tpe return level exceeds the mean maximum")
      assert(gs > 0.0)
    }
    assert(out.keySet === daily.map(_._1).toSet)
  }
}
