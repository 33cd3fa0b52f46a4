package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-31 semantics: the PIT join resolves every event to its own run
  * (full self-consistency), the moving median is robust where the
  * moving average is not. */
class Wave31Spec extends SparkSuite {

  test("join_scd2_pit: every event resolves, and to its own type's run") {
    val rows = SparkEntry.queries("join_scd2_pit")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1), s"${r.getString(0)}: unmatched events")
      assert(r.getLong(3) === r.getLong(1), s"${r.getString(0)}: wrong-version hits")
    }
  }

  test("timeseries_moving_median: equals driver replay; shrugs off a planted spike") {
    val rows = SparkEntry.queries("timeseries_moving_median")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val byDay = series.sortBy(_._2)
      byDay.indices.foreach { i =>
        val win = byDay.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val med = win((win.length - 1) / 2)
        assert(byDay(i)._4 === med)
      }
    }
    // robustness: replace one mid-series day's total with an extreme
    // value; at most the windows containing it move, and the median of
    // any 7-day window moves to another OBSERVED value, never the spike
    val series = rows.filter(_._1 == rows.head._1).sortBy(_._2).map(_._3)
    if (series.length >= 8) {
      val spiked = series.updated(series.length / 2, Long.MaxValue / 2)
      val i = series.length / 2 + 3
      val win = spiked.slice(i - 6, i + 1).sorted
      val med = win((win.length - 1) / 2)
      assert(med < Long.MaxValue / 2, "median chased the spike")
    }
  }
}
