package graft

import org.apache.spark.sql.functions._

/** Wave-12 semantics: estimator calibration is sane (MinHash error is
  * bounded and the estimate is a lattice point), schema evolution
  * produces NULL (not defaults) for unevolved rows, and the chi-squared
  * profiler's cells cover every observed (type, dow) combination. */
class Wave12Spec extends SparkSuite {

  test("eval_minhash: est_sim on the 1/32 lattice; jacc in [0,1]; errors bounded by 1") {
    val rows = SparkEntry.queries("eval_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(r.fieldIndex("est_sim"))
      val jacc = r.getDouble(r.fieldIndex("jacc"))
      val err = r.getDouble(r.fieldIndex("abs_err"))
      assert((est * 32).round / 32.0 === est, s"est $est not a /32 lattice point")
      assert(jacc >= 0.0 && jacc <= 1.0)
      assert(err >= 0.0 && err <= 1.0)
      assert(math.abs(math.abs(est - jacc) - err) < 1e-6)
    }
  }

  test("sink_evolve: unevolved rows read NULL in the added column, evolved rows carry it") {
    val rows = SparkEntry.queries("sink_evolve")(spark, sf).collect()
    val segs = rows.map(_.getString(0))
    assert(segs.contains("__unevolved"), segs.mkString(","))
    assert(segs.length > 1, "no evolved segment appeared")
    // conservation: every base row survives the evolving MERGE
    val n = rows.map(_.getLong(1)).sum
    val base = graft.engine.Tables.load(spark, sf, "customer").count()
    assert(n === base)
  }

  test("profile_chisq: per-type cells bounded by 7 weekdays; chi2 non-negative") {
    val rows = SparkEntry.queries("profile_chisq")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_cells")) <= 7L)
      assert(r.getDouble(r.fieldIndex("chi2_part")) >= 0.0)
    }
  }
}
