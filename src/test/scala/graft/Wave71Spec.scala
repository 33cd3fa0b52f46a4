package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-71 semantics: the event-study curve replays from local cell
  * arithmetic; hapax stats replay from a local term-frequency scan. */
class Wave71Spec extends SparkSuite {

  test("events_event_study: gaps replay from local cells") {
    val rows = SparkEntry.queries("events_event_study")(spark, sf).collect()
    assert(rows.nonEmpty)
    import java.security.MessageDigest
    def arm(u: Long): Int = {
      val hex = MessageDigest.getInstance("MD5")
        .digest((u.toString + ":ab").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2).toInt
    }
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), (floor(unix_timestamp(col("ts")) / 86400)).cast("long").as("d"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect().map(r => (arm(r.getLong(0)), r.getLong(1) / 7, r.getLong(2)))
    val wks = ev.map(_._2.toDouble).sorted
    val n = wks.length
    val medC = if (n % 2 == 1) wks(n / 2) else (wks(n / 2 - 1) + wks(n / 2)) / 2.0
    val w0 = math.floor(medC).toLong
    rows.foreach { r =>
      val rel = r.getLong(0)
      val t = ev.filter(e => e._1 == 1 && e._2 - w0 == rel)
      val c = ev.filter(e => e._1 == 0 && e._2 - w0 == rel)
      assert(r.getLong(1) === t.length.toLong && r.getLong(2) === c.length.toLong)
      val num = BigInt(t.map(_._3).sum) * c.length - BigInt(c.map(_._3).sum) * t.length
      val den = BigInt(t.length.toLong) * c.length
      val mag = (2 * num.abs * 10000 + den) / (2 * den)
      val g = (if (num < 0) -mag else mag).toLong
      assert(math.abs(r.getDouble(3) - g / 1e6) < 1e-9, s"rel $rel gap")
    }
  }

  test("text_hapax: replays from a local term-frequency scan") {
    val rows = SparkEntry.queries("text_hapax")(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      val tf = ds.flatMap(_._2).groupBy(identity).map(_._2.length.toLong)
      src -> (tf.size.toLong, tf.count(_ == 1L).toLong, tf.sum)
    }
    rows.foreach { r =>
      val (v, h, tk) = bySrc(r.getString(0))
      assert(r.getLong(1) === v && r.getLong(2) === h && r.getLong(3) === tk)
      assert(math.abs(r.getDouble(4) - ((2 * h * 1000000L + v) / (2 * v)) / 1e6) < 1e-9)
      assert(math.abs(r.getDouble(5) - ((2 * tk * 1000000L + v) / (2 * v)) / 1e6) < 1e-9)
    }
    assert(rows.map(_.getString(0)).length === bySrc.size)
  }
}
