package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-91 semantics: quarantine routing replays from a local md5
  * walk; the sequence pattern replays from a local per-user scan. */
class Wave91Spec extends SparkSuite {

  private def md5Mod(s0: String, mod: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % mod
  }

  test("sink_quarantine: local routing replay; routes partition the batch") {
    val rows = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_discount").collect()
    val routed = rows.map { r =>
      def k(i: Int): Long = r.getAs[Number](i).longValue
      val key = s"${k(0)}#${k(1)}#${k(2)}#${k(3)}"
      val qty = if (md5Mod(key + "#q", 20) == 0) -1.0 else r.getDouble(4)
      val disc = if (md5Mod(key + "#d", 25) == 0) 0.5 else r.getDouble(5)
      val route =
        if (qty < 1 || qty > 50) "quarantine:qty_range"
        else if (disc < 0 || disc > 0.1) "quarantine:disc_range"
        else "published"
      (route, math.round(qty * 100))
    }
    val expect = routed.groupBy(_._1).map { case (rt, xs) =>
      rt -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val out = SparkEntry.queries("sink_quarantine")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === expect)
    assert(out.values.map(_._1).sum === rows.length.toLong)
    assert(out.keySet.contains("published"))
  }

  test("events_seq_pattern: local per-user strict-sequence replay") {
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).flatMap { case (u, es) =>
      val seq = es.sortBy(e => (e._4, e._2))
      val hits = seq.indices.dropRight(2).filter { i =>
        seq(i)._3 == "view" && seq(i + 1)._3 == "click" &&
          seq(i + 2)._3 == "purchase" && seq(i + 2)._4 - seq(i)._4 <= 3600L
      }
      if (hits.isEmpty) None
      else Some(u -> ((hits.size.toLong, seq(hits.min)._4)))
    }
    val out = SparkEntry.queries("events_seq_pattern")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === expect)
  }
}
