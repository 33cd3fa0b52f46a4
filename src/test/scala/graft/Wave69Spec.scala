package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-69 semantics: the exposure curve replays from a local per-user
  * ordered scan; split PSI addends replay from local band counts and
  * the hash split is statistically calm. */
class Wave69Spec extends SparkSuite {

  test("events_exposure_curve: replays from a local per-user ordered scan") {
    val rows = SparkEntry.queries("events_exposure_curve")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val indexed = ev.groupBy(e => (e._1, e._3)).values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).zipWithIndex.map { case (e, i) =>
        (e._3, math.min(i + 1L, 10L), e._5)
      }
    }
    val curve = indexed.groupBy(e => (e._1, e._2)).map { case ((et, ex), v) =>
      val n = v.size.toLong; val sc = v.map(_._3).sum
      (et, ex) -> (n, (2 * sc * 10000L + n) / (2 * n))
    }
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, mm) = curve(k)
      assert(r.getLong(2) === n, s"$k n")
      assert(math.abs(r.getDouble(3) - mm / 1e6) < 1e-9, s"$k mean")
      val m1 = curve((r.getString(0), 1L))._2
      val rel = (2 * mm * 1000000L + m1) / (2 * m1)
      assert(math.abs(r.getDouble(4) - rel / 1e6) < 1e-9, s"$k rel")
    }
    // first exposure is the reference: vs_first == 1 at exposure 1
    rows.filter(_.getLong(1) == 1L).foreach(r =>
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-6))
  }

  test("split_drift: addends replay exactly from local band counts") {
    val rows = SparkEntry.queries("split_drift")(spark, sf).collect()
    assert(rows.length > 1)
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf, "documents")
      .select("n_chars", "text").collect()
      .map { r =>
        val bucket = java.lang.Long.parseLong(md5hex(r.getString(1)).substring(0, 15), 16) % 100
        val split = if (bucket <= 97) "train" else if (bucket == 98) "val" else "test"
        (r.getLong(0), split)
      }.filter(d => d._2 == "train" || d._2 == "val")
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    val bands = docs.map { case (nc, sp) =>
      (math.min(9L, (nc - lo) * 10 / (hi - lo + 1)), sp)
    }
    val nt = bands.count(_._2 == "train").toLong
    val nv = bands.count(_._2 == "val").toLong
    rows.foreach { r =>
      val band = r.getLong(0)
      val ct = bands.count(b => b._1 == band && b._2 == "train").toLong
      val cv = bands.count(b => b._1 == band && b._2 == "val").toLong
      assert(r.getLong(1) === ct && r.getLong(2) === cv, s"band $band counts")
      val p = math.max(1L, (2 * ct * 1000000L + nt) / (2 * nt))
      val q = math.max(1L, (2 * cv * 1000000L + nv) / (2 * nv))
      val addend = ((p - q) * (lnq(p) - lnq(q))) / 1000000L
      assert(math.abs(r.getDouble(5) - addend / 1e9) < 1e-9, s"band $band addend")
      assert(r.getDouble(5) >= 0.0)
    }
    // NOTE: with a 1% val split at fixture scale the empty-band floor
    // dominates (PSI is legitimately large) — the exact replay above,
    // not a calmness bound, is the contract.
  }
}
