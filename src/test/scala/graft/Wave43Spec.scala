package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-43 semantics: DiD reconciles with a local panel replay; power
  * n grows with variance and shrinks with MDE; Neyman allocation sums
  * near budget and favors big/spread strata; burstiness VMR ≥ 0 with
  * burst ≥ 1. */
class Wave43Spec extends SparkSuite {

  test("events_did: estimate matches local replay of per-user diffs") {
    val row = SparkEntry.queries("events_did")(spark, sf).head
    def foldOf(uid: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((uid.toString + ":ab").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val users = ev.groupBy(_._1).toArray.map { case (uid, es) =>
      (foldOf(uid),
        es.filter(_._2 > mid).map(_._3).sum - es.filter(_._2 <= mid).map(_._3).sum)
    }
    val tr = users.filter(_._1 == 1).map(_._2)
    val ct = users.filter(_._1 == 0).map(_._2)
    assert(row.getLong(0) === tr.length.toLong)
    assert(row.getLong(1) === ct.length.toLong)
    val did = (tr.sum.toDouble / tr.length - ct.sum.toDouble / ct.length) / 1e6
    assert(math.abs(row.getDouble(row.fieldIndex("did")) - did) < 1e-4)
    // t = did / se must reconcile with the reported columns
    val t = row.getDouble(row.fieldIndex("did")) / row.getDouble(row.fieldIndex("se"))
    assert(math.abs(row.getDouble(row.fieldIndex("t_stat")) - t) < 1e-2)
  }

  test("events_power: n_per_arm tracks variance / mde^2") {
    val rows = SparkEntry.queries("events_power")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sd = r.getDouble(r.fieldIndex("sd"))
      val mde = r.getDouble(r.fieldIndex("mde"))
      val n = r.getLong(r.fieldIndex("n_per_arm"))
      val expect = math.ceil(2.0 * sd * sd * math.pow(1.959964 + 0.841621, 2) / (mde * mde))
      // reported columns are rounded; allow 2% slack on the reconstruction
      assert(math.abs(n - expect) <= math.max(2.0, expect * 0.02),
        s"${r.getString(0)}: n=$n expect=$expect")
      assert(n > 0)
    }
  }

  test("sample_neyman: allocations within strata sizes and near budget") {
    val rows = SparkEntry.queries("sample_neyman")(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val nH = r.getLong(2); val alloc = r.getLong(r.fieldIndex("alloc"))
      assert(alloc >= 0 && alloc <= nH)
      total += alloc
    }
    // the total can only undershoot 1000 when strata caps bind (small
    // fixtures have < 1000 docs); it never overshoots beyond rounding
    assert(total <= 1000L + rows.length.toLong, s"total allocation $total")
    assert(total > 0L)
    // Neyman proportionality replay: alloc = min(n_h, floor(1000*w/wt + .5))
    // reconstructed from the reported (n_h, sd_h) — ±1 for sd rounding
    val ws = rows.map(r => r.getLong(2).toDouble * r.getDouble(r.fieldIndex("sd_h")))
    val wt = ws.sum
    rows.zip(ws).foreach { case (r, w) =>
      val expect = math.min(r.getLong(2), math.floor(1000.0 * w / wt + 0.5).toLong)
      assert(math.abs(r.getLong(r.fieldIndex("alloc")) - expect) <= 1L,
        s"${r.getString(0)}/${r.getString(1)}: alloc ${r.getLong(r.fieldIndex("alloc"))} vs $expect")
    }
  }

  test("text_burstiness: vmr >= 0, burst >= 1, ordered by total count") {
    val rows = SparkEntry.queries("text_burstiness")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("vmr")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("burst")) >= 1.0 - 1e-9)
      assert(r.getLong(r.fieldIndex("df")) <= r.getLong(r.fieldIndex("tc")))
    }
    val tcs = rows.map(_.getLong(2))
    assert(tcs.sameElements(tcs.sortBy(-_)), "not ordered by tc desc")
  }
}
