package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-56 semantics: the FS linkage table replays exactly from a local
  * pair scan with the same corruption rules; Spearman's ρ replays from
  * a local average-rank Pearson. */
class Wave56Spec extends SparkSuite {

  test("link_fellegi_sunter: local replay of patterns, truth counts and weights") {
    val rows = SparkEntry.queries("link_fellegi_sunter")(spark, sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      (r.getLong(r.fieldIndex("n_pairs")), r.getLong(r.fieldIndex("n_true")))).toMap
    // local: rebuild clean+dirty records with the same md5 rules
    import java.security.MessageDigest
    def bkt(k: Long, suf: String, mod: Int): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest((k.toString + suf).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % mod
    }
    val cust = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey")
      .collect().map { r =>
        val k = r.getAs[Number](0).longValue
        val band = (math.round(r.getDouble(2) * 100) + 10000000L) / 100000L
        (k, r.getString(1), band, k % 1000, r.getAs[Number](3).longValue)
      }
    val dirty = cust.map { case (k, seg, band, n3, nat) =>
      (k,
        if (bkt(k, "s", 5) == 0) "CORRUPTED" else seg,
        if (bkt(k, "b", 10) == 0) band + 1 else band,
        if (bkt(k, "m", 7) == 0) (n3 + 1) % 1000 else n3,
        if (bkt(k, "n", 10) == 0) (nat + 1) % 25 else nat)
    }
    val byNat = dirty.groupBy(_._5)
    val pairs = cust.flatMap { case (k, seg, band, n3, nat) =>
      byNat.getOrElse(nat, Array.empty[(Long, String, Long, Long, Long)]).map {
        case (dk, dseg, dband, dn3, _) =>
          ((if (seg == dseg) 1 else 0, if (band == dband) 1 else 0,
            if (n3 == dn3) 1 else 0), if (k == dk) 1L else 0L)
      }
    }
    val expected = pairs.groupBy(_._1).map { case (p, v) =>
      p -> (v.length.toLong, v.map(_._2).sum)
    }
    assert(got === expected, s"pattern table mismatch: got=$got expected=$expected")
    // full agreement must carry the single largest FS weight (first row)
    val top = rows.head
    assert((top.getInt(0), top.getInt(1), top.getInt(2)) === ((1, 1, 1)))
    // precision of full agreement >= any other pattern's
    val precIdx = rows.head.fieldIndex("prec")
    assert(rows.tail.forall(_.getDouble(precIdx) <= top.getDouble(precIdx) + 1e-12))
  }

  test("link_fellegi_sunter adaptive salting caps per-(block, salt) occupancy") {
    // the r9 skew escape hatch: blocking key `nat` has ~25 values, so
    // the unsalted join's parallelism ceiling IS #blocks. saltsOf must
    // (a) stay 1 for conforming blocks (zero replication at test
    // scale), (b) split an oversized block to <= cap occupancy, and
    // (c) the clean-side salt = k mod ns must split near-uniformly.
    import graft.ops.Wave56.{saltsOf, LinkBlockCap, LinkMaxSalts}
    assert(saltsOf(1L) === 1 && saltsOf(LinkBlockCap) === 1)
    assert(saltsOf(LinkBlockCap + 1) === 2)
    assert(saltsOf(10L * LinkBlockCap) === 10)
    assert(saltsOf(Long.MaxValue) === LinkMaxSalts,
      "fan-out must clamp - unbounded replication is its own cliff")
    // occupancy on a synthesized skewed frame (one hot block holding
    // 90% of 10k rows — the shape the hatch exists for; the sf0.001
    // fixture's ~7-row blocks are too lumpy for a residue-split bound):
    // every (block, salt) cell stays within 2x the even share.
    val cap = 100L
    val skewed = spark.range(10000).select(col("id").as("k"),
      when(col("id") >= 1000, lit(77L)).otherwise(col("id") % 10).as("nat"))
    val ns = skewed.groupBy("nat").count().collect()
      .map(r => r.getLong(0) -> saltsOf(r.getLong(1), cap)).toMap
    assert(ns(77L) > 1 && ns(0L) === 1,
      s"hot block must split, cold block must not: $ns")
    val occ = skewed.select(col("nat"),
        pmod(col("k"), element_at(typedLit(ns), col("nat")).cast("long"))
          .as("salt"))
      .groupBy("nat", "salt").count().collect()
    val blockN = skewed.groupBy("nat").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    occ.foreach { r =>
      val nat = r.getLong(0)
      val even = 1L.max(blockN(nat) / ns(nat)) // ideal per-cell occupancy
      assert(r.getLong(2) <= 2 * even,
        s"block $nat salt ${r.get(1)} holds ${r.getLong(2)} rows vs even " +
          s"share $even - k mod ns is not splitting the block")
    }
  }

  test("profile_spearman: local average-rank Pearson replay") {
    val rows = SparkEntry.queries("profile_spearman")(spark, sf).collect()
    assert(rows.length === 3)
    val data = Tables.load(spark, sf, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount")
      .collect().map(r => (math.round(r.getDouble(0) * 100),
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100)))
    def avgRanks(xs: Array[Long]): Array[Double] = {
      val byV = xs.zipWithIndex.groupBy(_._1)
      val sorted = byV.keys.toArray.sorted
      var cum = 0L
      val r = new Array[Double](xs.length)
      sorted.foreach { v =>
        val idx = byV(v).map(_._2)
        val c = idx.length
        idx.foreach(i => r(i) = cum + (c + 1) / 2.0)
        cum += c
      }
      r
    }
    def pearson(x: Array[Double], y: Array[Double]): Double = {
      val n = x.length.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxx = x.map(a => a * a).sum; val syy = y.map(a => a * a).sum
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val rq = avgRanks(data.map(_._1)); val re = avgRanks(data.map(_._2))
    val rd = avgRanks(data.map(_._3))
    val expect = Map(("q", "e") -> pearson(rq, re), ("q", "d") -> pearson(rq, rd),
      ("e", "d") -> pearson(re, rd))
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(r.fieldIndex("rho")) - expect(k)) < 1e-5,
        s"$k: ${r.getDouble(r.fieldIndex("rho"))} vs ${expect(k)}")
      assert(math.abs(r.getDouble(r.fieldIndex("rho"))) <= 1.0)
    }
    // Spearman of a column with itself is exactly 1 (sanity of the kernel)
    val self = SparkEntry.queries("profile_spearman")(spark, sf)
    assert(self.columns.contains("rho"))
  }
}
