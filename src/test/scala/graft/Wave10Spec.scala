package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wave-10 semantics + plan contracts: the e2e funnel is consistent
  * with its component gates, KS matches the naive windowed form and
  * runs on the two-phase kernel, the CMS error contract holds, and the
  * Heaps curve is monotone and lands exactly on the full corpus. */
class Wave10Spec extends SparkSuite {

  test("pipeline_e2e budget sheet conserves the gated+deduped survivor set") {
    val out = SparkEntry.queries("pipeline_e2e")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    val gated = ops.Wave3.queries("corpus_filter")(spark, sf)
      .filter(col("keep")).count()
    // dedup can only shrink the gated set, never grow it — and the
    // fixture corpus has at least one surviving doc per gate design
    assert(nDocs > 0 && nDocs <= gated)
  }

  test("profile_ks equals the naive per-type windowed-CDF form") {
    import graft.engine.Tables
    val ev = Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"))
    val mid = ev.agg(
      expr("percentile(datediff(d, DATE '1970-01-01'), 0.5)")).head.getDouble(0)
    val cnt = ev.select(col("event_type"), col("value"),
        when(datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("double") <= mid, "p1").otherwise("p2").as("period"))
      .groupBy("event_type", "value")
      .agg(sum(when(col("period") === "p1", 1L).otherwise(0L)).as("n1"),
        sum(when(col("period") === "p2", 1L).otherwise(0L)).as("n2"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cnt.withColumn("c1", sum("n1").over(w))
      .withColumn("c2", sum("n2").over(w))
    val tot = cum.groupBy("event_type")
      .agg(max("c1").as("nn1"), max("c2").as("nn2"))
    val ref = cum.join(tot, Seq("event_type"))
      .groupBy("event_type")
      .agg(max("nn1").as("n1"), max("nn2").as("n2"),
        max(abs(col("c1") * col("nn2") - col("c2") * col("nn1"))).as("d_num"))
      .select(col("event_type"), col("n1"), col("n2"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n1") * col("n2")).cast("double"), 6).as("ks_d"))
      .orderBy("event_type").collect()
    val got = SparkEntry.queries("profile_ks")(spark, sf).collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("profile_ks rides the pid-keyed kernel — no per-type global window") {
    val df = SparkEntry.queries("profile_ks")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("sketch_countmin: CMS never undercounts and stays under the eps*N cap") {
    val rows = SparkEntry.queries("sketch_countmin")(spark, sf).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(2)), "CMS undercounted a probe term")
    assert(rows.forall(_.getBoolean(3)), "CMS overshot the eps*N cap")
  }

  test("sketch_countmin: half-corpus sketches merge to the full-corpus sketch") {
    import graft.engine.Tables
    import org.apache.spark.util.sketch.CountMinSketch
    val tok = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => x =!= "")).as("w"))
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch = {
      val bytes = df.agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)"))
        .head.getAs[Array[Byte]](0)
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    val full = sketchOf(tok)
    val even = sketchOf(tok.filter(col("doc_id") % 2 === 0))
    val odd = sketchOf(tok.filter(col("doc_id") % 2 =!= 0))
    val merged = even.mergeInPlace(odd)
    assert(merged.totalCount === full.totalCount)
    val probes = tok.groupBy("w").count().orderBy(desc("count"), asc("w"))
      .limit(16).collect().map(_.getString(0))
    probes.foreach { w =>
      assert(merged.estimateCount(w) === full.estimateCount(w),
        s"merge changed the estimate for '$w'")
    }
  }

  test("text_heaps: monotone growth, final decile covers the whole corpus") {
    import graft.engine.Tables
    val rows = SparkEntry.queries("text_heaps")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length === 10)
    Seq("n_docs", "n_tokens", "vocab").foreach { c =>
      val xs = rows.map(r => r.getLong(r.fieldIndex(c)))
      assert(xs.zip(xs.tail).forall { case (a, b) => a <= b }, s"$c not monotone")
    }
    val docs = Tables.load(spark, sf, "documents")
    val vocabAll = docs
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        x => x =!= "")).as("w"))
      .agg(countDistinct("w")).head.getLong(0)
    val last = rows.last
    assert(last.getLong(last.fieldIndex("n_docs")) === docs.count())
    assert(last.getLong(last.fieldIndex("vocab")) === vocabAll)
  }
}
