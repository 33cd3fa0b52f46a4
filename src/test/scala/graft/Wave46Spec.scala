package graft

import org.apache.spark.sql.functions._

/** Wave-46 semantics: VIFs ≥ 1 with symmetric correlations in [−1,1];
  * bandit posteriors conserve counts and UCB dominates the plain mean;
  * epoch accounting conserves the uniform budget split. */
class Wave46Spec extends SparkSuite {

  test("profile_vif: correlations bounded, VIFs >= 1, R2 identity holds") {
    val r = SparkEntry.queries("profile_vif")(spark, sf).head
    val rab = r.getDouble(r.fieldIndex("r_qty_price"))
    val rac = r.getDouble(r.fieldIndex("r_qty_disc"))
    val rbc = r.getDouble(r.fieldIndex("r_price_disc"))
    Seq(rab, rac, rbc).foreach(x => assert(x >= -1.0 && x <= 1.0))
    val vifs = Seq("vif_quantity", "vif_price", "vif_discount")
      .map(c => r.getDouble(r.fieldIndex(c)))
    vifs.foreach(v => assert(v >= 1.0 - 1e-6, s"VIF < 1: $v"))
    // replay the R2 identity for quantity
    val r2q = (rab * rab + rac * rac - 2 * rab * rac * rbc) / (1 - rbc * rbc)
    assert(math.abs(vifs.head - 1.0 / (1.0 - r2q)) < 1e-3)
  }

  test("events_bandit: posterior counts conserve; ucb >= mean") {
    val rows = SparkEntry.queries("events_bandit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n"))
      val succ = r.getLong(r.fieldIndex("succ"))
      assert(r.getLong(r.fieldIndex("post_alpha")) === succ + 1)
      assert(r.getLong(r.fieldIndex("post_beta")) === n - succ + 1)
      val pm = r.getDouble(r.fieldIndex("post_mean"))
      assert(pm > 0.0 && pm < 1.0)
      assert(r.getDouble(r.fieldIndex("ucb")) >= succ.toDouble / n - 1e-9)
    }
  }

  test("corpus_epochs: effective tokens cap at 4 passes; flags match") {
    val rows = SparkEntry.queries("corpus_epochs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = r.getLong(r.fieldIndex("tok"))
      val ep = r.getDouble(r.fieldIndex("epochs"))
      val eff = r.getLong(r.fieldIndex("effective_tokens"))
      assert(r.getBoolean(r.fieldIndex("over_replayed")) === (ep > 4.0))
      assert(eff <= 4L * tok)
      assert(math.abs(eff - math.floor(math.min(ep, 4.0) * tok)) <= tok * 1e-5 + 1)
    }
  }
}
