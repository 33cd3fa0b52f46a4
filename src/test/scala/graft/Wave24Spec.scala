package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-24 semantics: Gini bounds + agreement with the textbook
  * mean-absolute-difference definition, monotone quality sweep,
  * OOV coverage consistency with the registered vocabulary. */
class Wave24Spec extends SparkSuite {

  test("profile_gini: in [0,1), matches the mean-absolute-difference definition") {
    val out = SparkEntry.queries("profile_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("gini"))).toMap
    assert(out.nonEmpty)
    out.values.foreach(g => assert(g >= 0.0 && g < 1.0))
    // independent definition: G = sum|xi-xj| / (2 n^2 mean)
    val vals = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    vals.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.map(_._2.toDouble)
      val n = xs.length
      val mean = xs.sum / n
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / (n.toLong * n)
      val g = mad / (2 * mean)
      assert(math.abs(out(tpe) - g) < 1e-4, s"$tpe: ${out(tpe)} vs $g")
    }
  }

  test("profile_gini plan: rank kernel, no single-partition exchange") {
    val plan = SparkEntry.queries("profile_gini")(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("eval_quality_sweep: kept counts and shares are threshold-monotone") {
    val rows = SparkEntry.queries("eval_quality_sweep")(spark, sf).collect()
    assert(rows.length >= 5)
    val byThr = rows.sortBy(_.getDouble(0))
    byThr.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getLong(1) <= lo.getLong(1), "n_kept must shrink")
        assert(hi.getDouble(3) >= lo.getDouble(3) - 1e-9,
          "mean kept quality must not drop as the gate tightens")
      case _ => ()
    }
    // the sweep must actually discriminate on this fixture
    assert(byThr.head.getLong(1) > byThr.last.getLong(1))
  }

  test("eval_vocab_coverage: oov tokens are exactly those outside the vocab") {
    val rows = SparkEntry.queries("eval_vocab_coverage")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = SparkEntry.queries("vocab_build")(spark, sf)
      .select("token").collect().map(_.getString(0)).toSet
    assert(vocab.size <= 256)
    val occ = Tables.load(spark, sf, "documents")
      .select(col("source"),
        explode(graft.ops.LlmPipeline.tokens(col("text"))).as("tk"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = occ.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getString(0)
      val toks = bySource(src).map(_._2)
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === toks.count(t => !vocab.contains(t)).toLong)
    }
  }
}
