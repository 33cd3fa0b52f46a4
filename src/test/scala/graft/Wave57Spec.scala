package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-57 semantics: the aHash dedup report replays exactly from a
  * local hasher + banded class-pair scan; motif distances replay from
  * a local sliding-window scan. */
class Wave57Spec extends SparkSuite {

  private def localHashes(): Array[Long] = {
    Tables.load(spark, sf, "documents")
      .select("text").collect().map { r =>
        val text = r.getString(0)
        val hist = new Array[Long](64)
        text.foreach(ch => hist(ch.toInt % 64) += 1)
        val totc = hist.sum
        var ph = 0L
        for (i <- 0 until 64) if (hist(i) * 64 > totc) ph |= (1L << i)
        ph
      }
  }

  test("multimodal_phash: report replays from a local aHash class scan") {
    val rows = SparkEntry.queries("multimodal_phash")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val classes = localHashes().groupBy(identity)
      .map { case (h, xs) => h -> xs.length.toLong }
    // within (hamming 0)
    val multi = classes.filter(_._2 >= 2)
    val expectedWithin = (multi.size.toLong, multi.values.map(n => n * (n - 1) / 2).sum)
    assert(rows(0L) === expectedWithin, s"within: ${rows(0L)} vs $expectedWithin")
    // cross-class banded pairs by hamming
    val hs = classes.keys.toArray.sorted
    val cross = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      (h1, h2) = (hs(i), hs(j))
      share = (0 until 4).exists { b =>
        val bv1 = (h1 >> (16 * b)) & 0xFFFFL
        bv1 != 0 && bv1 == ((h2 >> (16 * b)) & 0xFFFFL)
      }
      hd = java.lang.Long.bitCount(h1 ^ h2).toLong
      if share && hd <= 6
    } yield (hd, classes(h1) * classes(h2)))
      .groupBy(_._1).map { case (d, v) => d -> (v.size.toLong, v.map(_._2).sum) }
    cross.foreach { case (d, exp) =>
      assert(rows(d) === exp, s"hamming $d: ${rows.get(d)} vs $exp")
    }
    assert(rows.keys.filter(_ > 0).toSet === cross.keySet)
  }

  test("multimodal_phash: doc-pair mass never exceeds all-pairs") {
    val rows = SparkEntry.queries("multimodal_phash")(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val reported = rows.map(_.getLong(2)).sum
    assert(reported <= allPairs)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("timeseries_motif: distances replay from a local sliding-window scan") {
    val rows = SparkEntry.queries("timeseries_motif")(spark, sf).collect()
    assert(rows.length === 5)
    val daily = Tables.load(spark, sf, "events")
      .select((floor(unix_timestamp(col("ts")) / 86400)).cast("long").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect().groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(_.getLong(1)).sum
      }
    val d0 = daily.keys.min; val d1 = daily.keys.max
    val v = (d0 to d1).map(d => daily.getOrElse(d, 0L)).toArray
    val starts = 0 to (v.length - 7)
    val pairs = (for {
      a <- starts; b <- starts if b - a >= 7
      dd = (0 until 7).map(k => { val x = v(a + k) - v(b + k); x * x }).sum
    } yield (a + d0, b + d0, dd)).sortBy(p => (p._3, p._1, p._2)).take(5)
    rows.zip(pairs).foreach { case (r, (w1, w2, dd)) =>
      assert(r.getLong(0) === w1 && r.getLong(1) === w2)
      assert(math.abs(r.getDouble(2) - dd / 1e4) < 1e-9)
    }
  }
}
