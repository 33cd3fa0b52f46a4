package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.Streaming
import graft.ops.Streaming.EventRow

/** Wave-22 semantics: the bloom prefilter actually prunes (and never
  * changes the result), streaming windowed top-k equals the batch form,
  * SSSP distances satisfy the relaxation fixpoint, RI audit is clean on
  * the consistent fixture. */
class Wave22Spec extends SparkSuite {

  import spark.implicits._

  test("join_bloom: plan probes the bloom, prefilter prunes the fact side") {
    val df = SparkEntry.queries("join_bloom")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1500))
    // the prune is real: fact rows surviving the bloom are well under
    // the table size (urgent orders are ~20% of keys; FPP adds ~1%)
    val li = Tables.load(spark, sf, "lineitem")
    val urgent = Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = urgent.agg(org.apache.spark.sql.graftx.GraftNative
        .bloomAgg(xxhash64(col("o_orderkey")), 200000L, 1600000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val kept = li.filter(org.apache.spark.sql.graftx.GraftNative
      .mightContain(lit(bf), xxhash64(col("l_orderkey")))).count()
    val total = li.count()
    assert(kept < total / 2, s"bloom kept $kept of $total - no prune")
    // and the bloom admits every true key (no false negatives)
    val trueKeys = li.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= trueKeys)
  }

  test("stream_topk: streaming windowed sums + final rank equal the batch form") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streaming.windowedValueSums(input.toDF())
      .writeStream.format("memory").queryName("wtopk").outputMode("complete").start()
    try {
      input.addData(Tables.load(spark, sf, "events").as[EventRow].collect().toSeq)
      q.processAllAvailable()
      val byWindow = Window.partitionBy("wstart")
        .orderBy(col("sv_micro").desc, col("event_type").asc)
      val streamed = spark.table("wtopk")
        .withColumn("rn", row_number().over(byWindow).cast("bigint"))
        .filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val batch = SparkEntry.queries("stream_topk")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("graph_sssp: distances are a relaxation fixpoint and bounded by direct edges") {
    val dist = SparkEntry.queries("graph_sssp")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist("signup") === 0L)
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val edges = Tables.load(spark, sf, "events")
      .withColumn("nxt", lead(col("event_type"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("src"), col("dst"), expr("CAST(1000000000 DIV cnt AS BIGINT)").as("cost"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // fixpoint: no edge can still relax any settled distance
    edges.foreach { case (srcN, dstN, c) =>
      (dist.get(srcN), dist.get(dstN)) match {
        case (Some(ds), Some(dd)) => assert(dd <= ds + c, s"$srcN->$dstN relaxes")
        case (Some(_), None) => fail(s"$dstN reachable but missing")
        case _ => ()
      }
    }
  }

  test("profile_ri: the fixture is referentially consistent, audit covers all 6 FKs") {
    val rows = SparkEntry.queries("profile_ri")(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_child")) > 0)
      assert(r.getLong(r.fieldIndex("n_orphan")) === 0L, r.getString(0))
    }
  }

  test("profile_masks: brand and priority columns each collapse to one mask") {
    val rows = SparkEntry.queries("profile_masks")(spark, sf).collect()
    val brand = rows.filter(_.getString(0) == "p_brand").map(_.getString(1)).toSet
    assert(brand.nonEmpty && brand.subsetOf(Set("AAAAA#9", "AAAAA#99")), brand)
    val prio = rows.filter(_.getString(0) == "o_orderpriority")
    assert(prio.forall(r => r.getString(1).matches("9-[A ]+")))
  }
}
