package graft

import org.apache.spark.sql.functions._

/** Wave-20 semantics: top-p keeps the minimal mass-covering prefix —
  * at least P of the mass, and removing the last kept row would drop
  * below P. */
class Wave20Spec extends SparkSuite {

  test("win_top_p: kept share >= 0.9, minimal prefix, kernel plan") {
    val df = SparkEntry.queries("win_top_p")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getLong(r.fieldIndex("n_kept"))
      val total = r.getLong(r.fieldIndex("n_total"))
      val share = r.getDouble(r.fieldIndex("kept_share"))
      assert(kept >= 1 && kept <= total)
      assert(share >= 0.9 - 1e-9, s"share $share below target")
      // heavy concentration in the fixture: top-p must actually prune
      assert(kept < total)
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }
}
