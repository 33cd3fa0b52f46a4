package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-80 semantics: CCNet tiers replay from the engine's own lp
  * ranking (closure checks); k-means replays from a local Lloyd
  * loop. */
class Wave80Spec extends SparkSuite {

  test("corpus_ccnet_buckets: tiers partition each source; head outscores tail") {
    val rows = SparkEntry.queries("corpus_ccnet_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val bySource = rows.groupBy(_._1)
    val docTotal = Tables.load(spark, sf, "documents").count()
    // every source's tiers partition it: shares sum to ~1, counts to total
    assert(rows.map(_._3).sum === docTotal)
    bySource.foreach { case (src, ts) =>
      assert(math.abs(ts.map(_._4).sum - 1.0) < 1e-3, s"$src shares")
      val m = ts.map(t => t._2 -> t._5).toMap
      assert(m("head") > m("tail"), s"$src head outscores tail")
      if (m.contains("middle")) {
        assert(m("head") >= m("middle") && m("middle") >= m("tail"), src)
      }
    }
    // global tier sizes differ by at most 1 (ntile contract)
    val tierSizes = rows.groupBy(_._2).map(_._2.map(_._3).sum)
    assert(tierSizes.max - tierSizes.min <= 1)
  }

  test("ml_kmeans_rfm: local Lloyd replay") {
    val out = SparkEntry.queries("ml_kmeans_rfm")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val cust = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("f"),
        sum(round(col("o_totalprice")).cast("long")).as("m"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(cust.length)
    val sf0 = cust.map(_._2).sum; val sm0 = cust.map(_._3).sum
    val sff = cust.map(c => c._2 * c._2).sum; val smm = cust.map(c => c._3 * c._3).sum
    val mf = (2 * sf0 * 1000 + n) / (2 * n); val mm = (2 * sm0 * 1000 + n) / (2 * n)
    def sd(sxx: BigInt, sx: BigInt): BigInt = {
      val vMicro = (2 * (n * sxx - sx * sx) * 1000000 + n * n) / (2 * n * n)
      BigInt(math.round(math.sqrt(vMicro.toDouble / 1e6) * 1000))
    }
    val sdf = sd(sff, sf0); val sdm = sd(smm, sm0)
    def zq(x: BigInt, mean: BigInt, s2: BigInt): BigInt = {
      val d = x * 1000 - mean
      d.signum * ((2 * d.abs * 1000 + s2) / (2 * s2))
    }
    val zs = cust.map { case (ck, f, m) =>
      (ck, zq(f, mf, sdf), zq(m, mm, sdm), f, m)
    }
    val ranked = zs.sortBy(z => (z._3, z._1))
    val nn = ranked.length
    var cents: Seq[(Long, BigInt, BigInt)] = Seq(1, 3, 5, 7).map { k =>
      val rk = k * nn / 8 + 1
      val r = ranked(rk - 1)
      ((8L * (rk - 1) / nn / 2), r._2, r._3)
    }
    def assign(c: Seq[(Long, BigInt, BigInt)]) = zs.map { z =>
      val best = c.map { case (cl, c1, c2) =>
        ((z._2 - c1) * (z._2 - c1) + (z._3 - c2) * (z._3 - c2), cl)
      }.min
      (best._2, z, best._1)
    }
    for (_ <- 1 to 5) {
      cents = assign(cents).groupBy(_._1).toSeq.map { case (cl, mem) =>
        val s1 = mem.map(_._2._2).sum; val s2 = mem.map(_._2._3).sum
        val nc = BigInt(mem.size)
        (cl, s1.signum * ((2 * s1.abs + nc) / (2 * nc)),
          s2.signum * ((2 * s2.abs + nc) / (2 * nc)))
      }.sortBy(_._1)
    }
    val fin = assign(cents).groupBy(_._1)
    assert(out.keySet === fin.keySet.map(_.toLong))
    fin.foreach { case (cl, mem) =>
      val (onc, oc1, oc2, oaf, oam, oin) = out(cl)
      assert(onc === mem.size.toLong, s"cluster $cl size")
      val c = cents.find(_._1 == cl).get
      assert(math.abs(oc1 - c._2.toDouble / 1000) < 1e-9)
      assert(math.abs(oc2 - c._3.toDouble / 1000) < 1e-9)
      val sfc = mem.map(_._2._4).sum; val smc = mem.map(_._2._5).sum
      val nc = BigInt(mem.size)
      assert(math.abs(oaf - ((2 * sfc * 1000000 + nc) / (2 * nc)).toDouble / 1e6) < 1e-9)
      assert(math.abs(oam - ((2 * smc * 1000000 + nc) / (2 * nc)).toDouble / 1e6) < 1e-9)
      assert(math.abs(oin - mem.map(_._3.toDouble).sum) < 1e-3, s"cluster $cl inertia")
    }
  }
}
