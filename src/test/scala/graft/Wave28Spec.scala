package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-28 semantics: RFM bins are balanced quintiles covering every
  * user, the conversion median splits the mass, the bitmap count equals
  * the exact count on every group. */
class Wave28Spec extends SparkSuite {

  test("events_rfm: cells cover all users; marginal bins are balanced quintiles") {
    val rows = SparkEntry.queries("events_rfm")(spark, sf).collect()
    val nUsers = Tables.load(spark, sf, "events")
      .select(countDistinct("user_id")).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === nUsers)
    // each marginal bin holds n/5 +- 1 users (closed-form ntile balance)
    (0 to 2).foreach { dim =>
      val marginal = rows.groupBy(_.getLong(dim)).view
        .mapValues(_.map(_.getLong(3)).sum)
      assert(marginal.keys.toSet.subsetOf((1L to 5L).toSet))
      marginal.values.foreach(m =>
        assert(math.abs(m - nUsers / 5.0) <= 1.0, s"dim $dim bin size $m"))
    }
  }

  test("events_rfm plan: three kernel ranks, no single-partition window") {
    val plan = SparkEntry.queries("events_rfm")(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1200))
    assert(!plan.contains("windowspecdefinition(ri") &&
      !plan.contains("Window [row_number() windowspecdefinition()"),
      "global window leaked into the plan")
  }

  test("events_time_to_convert: median splits the first-conversion latencies") {
    val row = SparkEntry.queries("events_time_to_convert")(spark, sf).head
    val med = row.getLong(0)
    val n = row.getLong(1)
    // recompute the first-conversion latency list via the registered
    // stream_join pairs (same join semantics)
    val pairs = SparkEntry.queries("stream_join")(spark, sf)
      .collect().map(r => (r.getLong(r.fieldIndex("view_id")),
        r.getLong(r.fieldIndex("purchase_id")),
        r.getLong(r.fieldIndex("latency_s"))))
    val firsts = pairs.groupBy(_._1).map { case (_, ps) =>
      ps.minBy(p => (p._3, p._2))._3
    }.toSeq.sorted
    assert(firsts.length.toLong === n)
    assert(firsts((firsts.length - 1) / 2) === med)
  }

  test("agg_bitmap_distinct: bitmap count equals exact count on every type") {
    val rows = SparkEntry.queries("agg_bitmap_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), r.getString(0))
      assert(r.getLong(3) > 0)
    }
  }
}
