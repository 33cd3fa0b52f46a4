package graft

import org.apache.spark.sql.Row

/** Invariants for the wave-8 curation-analytics operators (the DuckDB
  * differential gate hash-checks exact values; these pin the semantic
  * and plan-shape contracts). */
class Wave8Spec extends SparkSuite {

  private def run(q: String) = SparkEntry.queries(q)(spark, sf)

  test("corpus_temperature: q sums to ~1 and small sources upweight (q/p falls with size)") {
    val rows = run("corpus_temperature").collect()
    assert(rows.nonEmpty)
    val qsum = rows.map(_.getAs[Double]("q")).sum
    assert(math.abs(qsum - 1.0) < 1e-3, s"q sum = $qsum")
    // temperature flattening: ordering by size must invert the q/p ratio
    val bySize = rows.sortBy(_.getAs[Long]("src_tok"))
    val ratios = bySize.map(r => r.getAs[Double]("q") / r.getAs[Double]("p"))
    assert(ratios.head >= ratios.last,
      s"smallest source must upweight at least as much as the largest: $ratios")
    // acceptance never exceeds the source's doc count
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("rate_ppm") <= 1000000L)
    }
  }

  test("profile_mutual_info: marginals are consistent and MI is a constant column") {
    val rows = run("profile_mutual_info").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    // each lang's n_l equals the sum of its cells
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      assert(cells.head.getAs[Long]("n_l") === cells.map(_.getAs[Long]("n")).sum)
    }
    assert(rows.map(_.getAs[Double]("mi_total")).distinct.length === 1)
    assert(n > 0)
  }

  test("text_zipf: slope is negative (frequency falls with rank) and n_terms matches the vocab") {
    val Array(Row(nTerms: Long, slope: Double, intercept: Double)) =
      run("text_zipf").collect()
    assert(slope < 0.0, s"zipf slope must be negative, got $slope")
    assert(intercept > 0.0)
    val vocab = run("text_termfreq").count()
    assert(nTerms === vocab)
  }

  test("text_zipf ranks via the two-phase kernel: windows are pid-keyed, never global") {
    val df = run("text_zipf")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
  }

  test("pipeline_funnel: stages are monotone non-increasing per source") {
    val rows = run("pipeline_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = Seq(r.getAs[Long]("n_total"), r.getAs[Long]("n_lang"),
        r.getAs[Long]("n_quality"), r.getAs[Long]("n_clean"),
        r.getAs[Long]("n_keep"))
      assert(seq.zip(seq.tail).forall { case (a, b) => a >= b },
        s"funnel must shrink stage by stage: ${r.getAs[String]("source")} $seq")
    }
  }
}
