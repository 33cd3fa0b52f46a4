package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The CLUSTER execution profile: whole-stage codegen ON (the
  * engineConfs default — only GraftSession.local's one-shot harness
  * turns it off, a measured JIT-warmup tradeoff documented there). The
  * shared test session applies `GraftSession.tuned` WITHOUT the local
  * override, so these assertions pin the plans a 1000-executor
  * deployment actually runs: vectorized (`Batched: true`) parquet scans,
  * fused WholeStageCodegen spans, and filter pushdown surviving codegen.
  */
class ClusterProfileSpec extends SparkSuite {

  /** AQE prints codegen spans only in the FINAL plan — execute first. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("test session runs the cluster profile: codegen enabled") {
    assert(spark.conf.get("spark.sql.codegen.wholeStage") === "true",
      "suite must assert plans under the codegen-ON cluster profile")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }

  test("profile_histogram under codegen: batched scan + codegen spans + partial agg") {
    graft.engine.Materialize.invalidate()
    val df = graft.ops.Profiler.histogramAgg(spark, sf, Seq(Tables.meta("orders")))
    val plan = finalPlan(df)
    graft.engine.Materialize.invalidate()
    assert(plan.contains("Batched: true"),
      s"expected a vectorized parquet scan in:\n${plan.take(1500)}")
    assert(plan.contains("*("),
      s"expected fused codegen spans (the *(n) markers) in:\n${plan.take(1500)}")
    // the FINAL aggregate always prints above the Exchange; the partial
    // phase is a SECOND HashAggregate below it (index past the Exchange)
    val exchange = plan.indexOf("Exchange")
    assert(exchange >= 0 && plan.indexOf("HashAggregate", exchange) >= 0,
      "partial aggregation must stay under the exchange with codegen on")
  }

  test("flagship_star_join under codegen: batched scans, pushed filters, broadcast joins") {
    val df = graft.SparkEntry.queries("flagship_star_join")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("Batched: true"),
      s"expected vectorized scans in:\n${plan.take(2000)}")
    assert(plan.contains("*("),
      s"expected codegen spans (the *(n) markers) in:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters: [IsNotNull("),
      s"filter pushdown must survive the codegen profile:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension joins must broadcast in the cluster profile:\n${plan.take(2000)}")
  }

  test("runtime bloom filter injects on selective shuffle joins (100 TB path)") {
    // The injection thresholds exist to skip tiny scans: creation side
    // under 10 MiB, application side OVER 10 GiB — exactly the 100 TB
    // fact-join shape. Fixture scans are far below 10 GiB, so lower the
    // thresholds to observe the same rewrite the cluster performs.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join shape bloom targets (broadcast joins
      // prune with their own dynamic filter instead)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val l = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy().agg(sum("l_quantity"))
      val plan = finalPlan(joined)
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter (might_contain) on the fact scan:\n${plan.take(2500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("profile_corr_matrix under codegen: one vectorized pass, long adders fused") {
    val df = graft.SparkEntry.queries("profile_corr_matrix")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("Batched: true"),
      s"expected a vectorized lineitem scan:\n${plan.take(1500)}")
    assert(plan.contains("*("),
      s"the 35-adder moment aggregate must fuse into codegen spans:\n${plan.take(1500)}")
    // single-pass law survives the cluster profile: no keyed exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corr must stay ONE global aggregation pass:\n${plan.take(1500)}")
  }

  test("native expressions stay inside whole-stage codegen (cosine scan)") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(graft.functions.Native.cosineSim(col("embedding"), col("qv")).as("cos"))
    val plan = finalPlan(df)
    val star = """\*\(\d+\) Project \[cosine_sim""".r
    assert(star.findFirstIn(plan).isDefined,
      s"CosineSim must sit INSIDE a codegen span (*(n) Project [cosine_sim...):\n${plan.take(1500)}")
  }
}
