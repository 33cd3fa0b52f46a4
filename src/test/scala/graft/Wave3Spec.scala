package graft

import org.apache.spark.sql.functions._

import graft.ops.Wave3

/** Properties of the round-3 wave beyond the DuckDB differential gate. */
class Wave3Spec extends SparkSuite {

  test("connectedComponents labels a deep chain in multiple supersteps") {
    import spark.implicits._
    // a 12-node path (diameter 11 -> 6 two-hop supersteps) plus an
    // isolated self-contained pair; every node must take the chain head's
    // label, exercising repeated rounds of the monotone-sum convergence
    val chain = (100L until 111L).map(i => (i, i + 1))
    val pairs = (chain :+ ((500L, 501L))).toDF("i", "j")
    val comp = Wave3.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((100L to 111L).forall(comp(_) === 100L), comp.toString)
    assert(comp(500L) === 500L && comp(501L) === 500L)
  }

  test("dedup_components has converged (labels are a fixed point)") {
    val comp = Wave3.queries("dedup_components")(spark, sf)
      .withColumnRenamed("component", "lbl").persist()
    // one more propagation round changes nothing: every neighbor pair
    // already shares a component label
    val pairs = graft.ops.LlmPipeline.queries("dedup_ngram_jaccard")(spark, sf)
      .select("i", "j")
    val mismatched = pairs
      .join(comp.withColumnRenamed("doc_id", "i").withColumnRenamed("lbl", "li"), "i")
      .join(comp.withColumnRenamed("doc_id", "j").withColumnRenamed("lbl", "lj"), "j")
      .filter(col("li") =!= col("lj"))
      .count()
    assert(mismatched === 0)
    // every component is labeled by its own minimum member
    val badRoot = comp.groupBy("lbl").agg(min("doc_id").as("mn"))
      .filter(col("lbl") =!= col("mn")).count()
    assert(badRoot === 0)
  }

  test("embed_quantize codes are int8-range and norms positive") {
    val q = Wave3.queries("embed_quantize")(spark, sf).persist()
    assert(q.filter(col("l2_norm") <= 0).count() === 0)
    // q is rendered as a comma-joined string (the differential gate
    // hashes scalar cells only) — split back to ints for the range check
    val outOfRange = q
      .select(explode(split(col("q"), ",")).as("c"))
      .select(col("c").cast("int").as("c"))
      .filter(col("c") > 127 || col("c") < -127)
      .count()
    assert(outOfRange === 0)
  }

  test("corpus_pack: pack ids are monotone and start at 0 per stratum") {
    val p = Wave3.queries("corpus_pack")(spark, sf).persist()
    val firsts = p.groupBy("lang", "source").agg(min("pack_id").as("mn"))
      .filter(col("mn") =!= 0).count()
    assert(firsts === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "source").orderBy("doc_id")
    val nonMonotone = p.withColumn("prev", lag("pack_id", 1).over(w))
      .filter(col("prev").isNotNull && col("pack_id") < col("prev")).count()
    assert(nonMonotone === 0)
  }

  test("corpus_mix: each source meets its quota or is exhausted, nothing over-fills") {
    val mix = Wave3.queries("corpus_mix")(spark, sf).persist()
    val all = graft.engine.Tables.load(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val per = mix.groupBy("source")
      .agg(max("quota").as("quota"), max("cum_tok").as("filled"),
        count(lit(1)).as("n_kept"))
      .join(all, "source")
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (quota, filled) = (r.getLong(r.fieldIndex("quota")), r.getLong(r.fieldIndex("filled")))
      val (kept, avail) = (r.getLong(r.fieldIndex("n_kept")), r.getLong(r.fieldIndex("n_docs")))
      // greedy fill: quota met (crossing doc included) or source exhausted
      assert(filled >= quota || kept === avail,
        s"source ${r.getString(0)}: filled=$filled < quota=$quota with docs left")
      // and never a doc beyond the crossing one: dropping the last kept
      // doc must land strictly under quota
      val lastTok = mix.filter(col("source") === r.getString(0))
        .orderBy(desc("cum_tok")).limit(1).head().getAs[Long]("n_tok")
      assert(filled - lastTok < quota, s"source ${r.getString(0)} over-filled")
    }
    mix.unpersist()
  }

  test("sim_knn_join agrees with per-query brute force") {
    val knn = Wave3.queries("sim_knn_join")(spark, sf)
      .filter(col("qid") === 3).select("vec_id").collect().map(_.getLong(0)).toSeq
    val e = graft.engine.Tables.load(spark, sf, "embeddings")
    val qv = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val brute = e.crossJoin(qv).filter(col("vec_id") =!= 3)
      .select(col("vec_id"),
        round(graft.functions.Native.cosineSim(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(knn === brute)
  }

  test("flagship_star_join plans broadcast dims + TakeOrderedAndProject") {
    val df = Wave3.queries("flagship_star_join")(spark, sf)
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("SparkEntry.entry flagship returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
