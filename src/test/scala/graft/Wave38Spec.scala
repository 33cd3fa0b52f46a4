package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-38 semantics: group k-fold never splits a dup cluster across
  * folds and covers every document once; the changepoint is the true
  * argmax of the centered CUSUM statistic. */
class Wave38Spec extends SparkSuite {

  test("sample_group_kfold: docs covered once, no cluster spans folds") {
    val rows = SparkEntry.queries("sample_group_kfold")(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L to 4L).toSet))
    // replay: same group -> same fold, for every dup component
    val comp = SparkEntry.queries("dedup_components")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def foldOf(grp: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(grp.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 5
    }
    comp.groupBy(_._2).foreach { case (grp, members) =>
      val folds = members.map(m => foldOf(grp)).distinct
      assert(folds.length === 1, s"cluster $grp spans folds")
    }
    // group counts tie out: every group counted in exactly one fold
    val groups = {
      val inComp = comp.map(_._1).toSet
      val singles = Tables.load(spark, sf, "documents").select("doc_id")
        .collect().map(_.getLong(0)).filterNot(inComp)
      comp.map(_._2).distinct.length + singles.length
    }
    assert(rows.map(_.getLong(2)).sum === groups.toLong)
  }

  test("events_changepoint: tau is the exact argmax of |n*cum_t - t*S_n|") {
    val rows = SparkEntry.queries("events_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val et = r.getString(0)
      val series = ev.filter(_._1 == et).sortBy(e => (e._3, e._2)).map(_._4)
      assert(r.getLong(1) === series.length.toLong)
      val cums = series.scanLeft(0L)(_ + _).tail
      val sn = cums.last
      val n = series.length
      val stats = (1 until n).map(t =>
        (BigInt(cums(t - 1)) * n - BigInt(t) * sn).abs)
      val best = stats.max
      val tau = stats.indexOf(best) + 1
      assert(r.getLong(2) === tau.toLong, s"$et tau")
      val pre = cums(tau - 1).toDouble / tau / 1e6
      val post = (sn - cums(tau - 1)).toDouble / (n - tau) / 1e6
      assert(math.abs(r.getDouble(3) - pre) < 1e-5)
      assert(math.abs(r.getDouble(4) - post) < 1e-5)
    }
  }
}
