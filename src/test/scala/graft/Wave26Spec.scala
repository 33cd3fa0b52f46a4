package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-26 semantics: the sweep's peak matches a driver-side interval
  * replay, Lorenz curves are convex and end at 1 (and integrate back to
  * the Gini), shares sum to 1 at every hierarchy level, multiplicity
  * histogram masses add up. */
class Wave26Spec extends SparkSuite {

  test("events_concurrency: peak matches a driver-side sweep replay") {
    val row = SparkEntry.queries("events_concurrency")(spark, sf).head
    val (peak, nSessions) = (row.getLong(0), row.getLong(2))
    assert(peak >= 1 && nSessions >= peak)
    // replay: sessionize driver-side with the same 30-min gap
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"),
        col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ordered.head._3; var last = ordered.head._4; var lastT = ordered.head._3
      ordered.tail.foreach { r =>
        if (r._4 - last > 1800 * 1000L) { buf += ((start, lastT)); start = r._3 }
        last = r._4; lastT = r._3
      }
      buf += ((start, lastT))
      buf.toSeq.map { case (a, b) => (uid, a, b) }
    }
    assert(sessions.length.toLong === nSessions)
    val bounds = sessions.flatMap { case (uid, a, b) =>
      Seq((a, 1L, uid), (b, -1L, uid)) }
      .sortBy(x => (x._1, x._2, x._3))
    var c = 0L; var mx = 0L
    bounds.foreach { b => c += b._2; mx = math.max(mx, c) }
    assert(peak === mx, s"kernel peak $peak vs replay $mx")
  }

  test("events_concurrency plan: empty-group kernel; single-partition exchanges only under partial aggregates") {
    val plan = SparkEntry.queries("events_concurrency")(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
    // the sweep itself must never serialize; the query's OUTPUT is a
    // scalar, so 1-row-per-partition exchanges under final aggregates
    // are fine — but each one's child must be a partial aggregate, not
    // a sort or the data path
    val lines = plan.linesIterator.toIndexedSeq
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
      case (_, i) =>
        val child = lines.drop(i + 1).find(_.trim.nonEmpty).getOrElse("")
        // the peak picker is max(struct(conc, -t)) — struct max has no
        // hash-agg buffer, so Catalyst plans a (keyless, sort-free)
        // SortAggregate; either engine is fine as long as it is partial
        assert((child.contains("HashAggregate") || child.contains("SortAggregate"))
            && child.contains("partial_"),
          s"SinglePartition exchange over non-aggregate child: $child")
    }
  }

  test("profile_lorenz: monotone convex-ish shares ending at 1; area gives the Gini") {
    val rows = SparkEntry.queries("profile_lorenz")(spark, sf).collect()
    val gini = SparkEntry.queries("profile_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("gini"))).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, cells) =>
      val byDecile = cells.sortBy(_.getLong(1))
      val shares = byDecile.map(_.getDouble(3))
      assert(math.abs(shares.last - 1.0) < 1e-9)
      shares.sliding(2).foreach { case Array(a, b) => assert(b >= a) case _ => () }
      // trapezoid AUC of the Lorenz curve (x = cumulative row share)
      val n = byDecile.map(_.getLong(2)).sum.toDouble
      val xs = byDecile.scanLeft(0.0)((acc, r) => acc + r.getLong(2) / n)
      val ys = 0.0 +: shares.toSeq
      val auc = (1 until xs.length).map(i =>
        (xs(i) - xs(i - 1)) * (ys(i) + ys(i - 1)) / 2).sum
      // decile-level trapezoids only approximate the row-level Gini
      // (within-decile shape is invisible); 2% is the coarse bound
      assert(math.abs((1 - 2 * auc) - gini(tpe)) < 2e-2,
        s"$tpe: 1-2*AUC=${1 - 2 * auc} vs gini ${gini(tpe)}")
    }
  }

  test("agg_share_of_parent: shares sum to 1 within region and globally") {
    val rows = SparkEntry.queries("agg_share_of_parent")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (region, ns) =>
      val sum = ns.map(_.getDouble(3)).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"$region nation shares sum $sum")
    }
    val regionShares = rows.groupBy(_.getString(0)).map(_._2.head.getDouble(4))
    assert(math.abs(regionShares.sum - 1.0) < 1e-4)
  }

  test("profile_multiplicity: masses reconcile with table and key counts") {
    val rows = SparkEntry.queries("profile_multiplicity")(spark, sf).collect()
    val li = Tables.load(spark, sf, "lineitem")
    assert(rows.map(_.getLong(2)).sum === li.count())
    assert(rows.map(_.getLong(1)).sum ===
      li.select(countDistinct("l_orderkey")).head.getLong(0))
  }
}
