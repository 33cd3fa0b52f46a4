package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-27 semantics: JSD bounds and self-divergence, islands
  * reconcile with the raw key set, weighted median is the true mass
  * midpoint, null-safe join covers exactly the customer set. */
class Wave27Spec extends SparkSuite {

  test("text_jsd: bounded by ln 2, zero iff the source matches the corpus") {
    val rows = SparkEntry.queries("text_jsd")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(r.fieldIndex("jsd"))
      assert(j >= 0.0 && j <= math.log(2) + 1e-9, s"jsd $j out of [0, ln2]")
      // sources differ from the blend, so none should be exactly 0
      assert(j > 0.0)
    }
  }

  test("events_streaks: histogram matches a driver-side streak replay") {
    val rows = SparkEntry.queries("events_streaks")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val days = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val longest = days.groupBy(_._1).map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      var best = 1L; var cur = 1L
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        cur = if (pair(1) == pair(0) + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }.toSeq
    val expect = longest.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows === expect)
    assert(rows.values.sum ===
      days.map(_._1).distinct.length.toLong)
    // the fixture produces real multi-day streaks AND broken ones
    assert(rows.keys.max > 1)
  }

  test("events_paths: counts match a groupBy over driver-side trigrams") {
    val rows = SparkEntry.queries("events_paths")(spark, sf).collect()
    assert(rows.length === 10)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getString(3)))
    val counts = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val types = es.sortBy(e => (e._3, e._2)).map(_._4)
      types.sliding(3).filter(_.length == 3).map(_.mkString(" > "))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(counts(r.getString(0)) === r.getLong(1), r.getString(0)))
    // top-1 really is the max count
    assert(rows.head.getLong(1) === counts.values.max)
  }

  test("agg_weighted_median: half the mass on each side, kernel plan") {
    val df = SparkEntry.queries("agg_weighted_median")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val w = Tables.load(spark, sf, "lineitem").groupBy("l_orderkey")
      .agg(count(lit(1)).as("wgt"))
    val o = Tables.load(spark, sf, "orders")
      .join(w, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"), col("o_totalprice"), col("wgt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val (prio, med) = (r.getString(0), r.getDouble(1))
      val grp = o.filter(_._1 == prio)
      val tot = grp.map(_._3).sum
      val below = grp.filter(_._2 < med).map(_._3).sum
      val upTo = grp.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < tot && upTo * 2 >= tot, s"$prio: $below/$upTo of $tot")
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
  }

  test("join_null_safe: every customer lands in exactly one bucket incl. NULL") {
    val rows = SparkEntry.queries("join_null_safe")(spark, sf).collect()
    val c = Tables.load(spark, sf, "customer")
    assert(rows.map(_.getLong(1)).sum === c.count())
    val unclassified = rows.filter(_.getString(0) == "UNCLASSIFIED")
    assert(unclassified.length === 1)
    assert(unclassified.head.getLong(1) ===
      c.filter(col("c_acctbal") < 0).count())
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }
}
