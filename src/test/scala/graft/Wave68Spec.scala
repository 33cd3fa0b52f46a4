package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-68 semantics: the overlap matrix replays from local source
  * gram sets; peaks replay from a local calendar scan. */
class Wave68Spec extends SparkSuite {

  test("corpus_overlap_matrix: replays from local source 5-gram sets") {
    val rows = SparkEntry.queries("corpus_overlap_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, tk) =>
        if (tk.length >= 5) tk.sliding(5).map(_.mkString(" ")).toSeq
        else Seq.empty
      }.toSet
    }
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val i = sets(s1).intersect(sets(s2)).size.toLong
      val (n1, n2) = (sets(s1).size.toLong, sets(s2).size.toLong)
      assert(r.getLong(2) === i, s"($s1,$s2) intersection")
      assert(r.getLong(3) === n1 && r.getLong(4) === n2)
      val u = n1 + n2 - i
      assert(math.abs(r.getDouble(5) - ((2 * i * 1000000L + u) / (2 * u)) / 1e6) < 1e-9)
      assert(math.abs(r.getDouble(6) - ((2 * i * 1000000L + n1) / (2 * n1)) / 1e6) < 1e-9)
      assert(math.abs(r.getDouble(7) - ((2 * i * 1000000L + n2) / (2 * n2)) / 1e6) < 1e-9)
    }
    // jaccard non-increasing down the report
    val js = rows.map(_.getDouble(5))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
  }

  test("events_peak_detection: replays from a local calendar scan") {
    val rows = SparkEntry.queries("events_peak_detection")(spark, sf).collect()
    val daily = Tables.load(spark, sf, "events")
      .select((floor(unix_timestamp(col("ts")) / 86400)).cast("long").as("day"),
        expr("cast(round(value * 100) as long)").as("c"))
      .collect().groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(_.getLong(1)).sum }
    val d0 = daily.keys.min; val d1 = daily.keys.max
    val v = (d0 to d1).map(d => daily.getOrElse(d, 0L)).toArray
    val sortedV = v.sorted
    val n = v.length
    val med2 = // 2x continuous median
      if (n % 2 == 1) 2 * sortedV(n / 2)
      else sortedV(n / 2 - 1) + sortedV(n / 2)
    val peaks = v.indices.flatMap { i =>
      val vl = if (i > 0) v(i - 1) else 0L
      val vr = if (i < n - 1) v(i + 1) else 0L
      if (v(i) > vl && v(i) > vr && v(i) * 4 > med2 * 3)
        Some((i + d0, v(i), v(i) - math.max(vl, vr)))
      else None
    }.sortBy(p => (-p._3, p._1)).take(10)
    assert(rows.length === peaks.length)
    rows.zip(peaks).foreach { case (r, (d, vv, prom)) =>
      assert(r.getLong(0) === d)
      assert(math.abs(r.getDouble(1) - vv / 100.0) < 1e-9)
      assert(math.abs(r.getDouble(2) - prom / 100.0) < 1e-9)
    }
  }
}
