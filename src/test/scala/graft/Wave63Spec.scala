package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-63 semantics: the systematic sample replays from a local
  * hash-ordered stride; decay scores replay from exact local BigInt
  * arithmetic. */
class Wave63Spec extends SparkSuite {

  test("sample_systematic: replays from a local hash-ordered stride") {
    val rows = SparkEntry.queries("sample_systematic")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), md5hex(r.getString(2))))
    val ordered = docs.sortBy { case (id, _, h) => (h, id) }
    val sampled = ordered.zipWithIndex.filter(_._2 % 20 == 0).map(_._1)
    val bySrc = docs.groupBy(_._2).map { case (s2, v) => s2 -> v.length.toLong }
    val expected = sampled.groupBy(_._2).map { case (s2, v) =>
      s2 -> (v.length.toLong, v.map(_._1).sum, bySrc(s2),
        v.length.toLong * 20 - bySrc(s2))
    }
    assert(rows === expected)
    // systematic expansion error is bounded by the stride for the TOTAL
    val totalSampled = rows.values.map(_._1).sum
    val total = bySrc.values.sum
    assert(math.abs(totalSampled * 20 - total) < 20)
  }

  test("win_decay_score: replays from exact local BigInt arithmetic") {
    val rows = SparkEntry.queries("win_decay_score")(spark, sf).collect()
    assert(rows.length === 10)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = ev.map(_._2).max
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      val raw = es.map { case (_, sec, c) =>
        val k = (t0 - sec) / (86400L * 30)
        if (k > 40) BigInt(0) else BigInt(c) << (40 - k).toInt
      }.sum
      u -> (raw, es.length.toLong, es.map(_._3).sum)
    }
    val top = byUser.toSeq.sortBy { case (u, (raw, _, _)) => (-raw, u) }.take(10)
    rows.zip(top).foreach { case (r, (u, (raw, n, ct))) =>
      assert(r.getLong(0) === u)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === ct)
      assert(r.getString(3) === raw.toString)
    }
  }
}
