package graft

import graft.ops.Wave95

/** Wave-95 behavior: pass@k estimator laws, geometric-mechanism DP
  * guarantees on the inlined threshold table, preference-pair
  * invariants. */
class Wave95Spec extends SparkSuite {

  test("eval_pass_at_k: estimator boundary laws hold on the emitted table") {
    val rows = SparkEntry.queries("eval_pass_at_k")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKC = rows.map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // c = 0 -> pass@k = 0; c = n -> pass@k = 1; monotone in c for fixed k
    for (((k, c), p) <- byKC) {
      if (c == 0L) assert(p === 0.0, s"pass@$k with 0 correct must be 0")
      if (c == 10L) assert(p === 1.0, s"pass@$k with all correct must be 1")
      byKC.get((k, c + 1)).foreach(p2 =>
        assert(p2 >= p, s"pass@$k must be monotone in c at c=$c"))
    }
    // k = 5 dominates k = 1 at every shared c (more draws can only help)
    for (((k, c), p) <- byKC if k == 1; p5 <- byKC.get((5, c)))
      assert(p5 >= p, s"pass@5 < pass@1 at c=$c")
    // task accounting: every task appears exactly once per k
    val nTasksPerK = rows.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(nTasksPerK.values.toSet.size === 1, s"per-k totals differ: $nTasksPerK")
  }

  test("privacy_dp_geometric: geometric-mechanism thresholds satisfy the epsilon ratio") {
    // the DP guarantee lives in the inlined threshold table: adjacent
    // noise values' probability masses (threshold widths) must differ by
    // at most e^epsilon (allowing the +-1 rounding of the 1e12 grid)
    val widths = Wave95.thresholdWidthsForSpec
    val eps = 0.5
    val maxRatio = math.exp(eps)
    widths.sliding(2).foreach { case Seq((k1, w1), (k2, w2)) =>
      val (hi, lo) = (math.max(w1, w2).toDouble, math.min(w1, w2).toDouble)
      assert(hi / math.max(lo, 1.0) <= maxRatio * 1.001,
        s"adjacent mass ratio at $k1/$k2 breaks e^eps: $w1 vs $w2")
    }
    // the table tiles [0, 1e12) exactly - every uniform draw maps to
    // exactly one noise value
    assert(widths.map(_._2).sum === 1000000000000L)
    // and the released counts replay deterministically
    val a = SparkEntry.queries("privacy_dp_geometric")(spark, sf).collect()
    val b = SparkEntry.queries("privacy_dp_geometric")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.length === 5, "five TPC-H market segments")
  }

  test("eval_preference_pairs: margins clear the bar and orders agree") {
    val rows = SparkEntry.queries("eval_preference_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chosen, rejected) = (r.getLong(2), r.getLong(3))
      val (cs, rs, m) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(chosen != rejected, "a pair must be two documents")
      assert(cs >= rs, "chosen must outscore rejected")
      assert(m >= 0.1 - 1e-9, s"margin $m below the 0.1 bar")
      assert(math.abs((cs - rs) - m) < 1e-9, "margin must be the score gap")
    }
    // at most one pair per (lang, source) group
    val groups = rows.map(r => (r.getString(0), r.getString(1)))
    assert(groups.distinct.length === groups.length)
  }
}
