package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-53 semantics: Jaccard scores replay exactly from local set
  * arithmetic; a checkpointed streaming aggregation restarted against
  * the same sink neither loses nor double-counts input files
  * (exactly-once recovery). */
class Wave53Spec extends SparkSuite {

  test("graph_node_jaccard: exact local set replay of the top pairs") {
    val rows = SparkEntry.queries("graph_node_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sets = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1).toSet }
    rows.foreach { r =>
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      val i = sets(p1).intersect(sets(p2)).size.toLong
      val u = sets(p1).union(sets(p2)).size.toLong
      assert(r.getLong(r.fieldIndex("shared")) === i, s"pair ($p1,$p2) intersection")
      assert(r.getLong(r.fieldIndex("union_n")) === u, s"pair ($p1,$p2) union")
      assert(math.abs(r.getDouble(r.fieldIndex("jaccard")) - i.toDouble / u) < 1e-6)
    }
    // scores non-increasing
    val js = rows.map(_.getDouble(4))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
  }

  test("checkpointed stream restart: no loss, no double-count (exactly-once)") {
    import spark.implicits._
    val root = graft.engine.Fs.freshScratch(spark, "streamrecover")
    val inDir = root + "/in"; val ckpt = root + "/ckpt"
    val all = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"))
    val (h1, h2) = (all.filter(pmod(col("event_id"), lit(2)) === 0),
      all.filter(pmod(col("event_id"), lit(2)) === 1))
    h1.write.mode("overwrite").parquet(inDir)
    def startQuery(name: String) = spark.readStream
      .schema("event_id LONG, event_type STRING")
      .parquet(inDir)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val q1 = startQuery("rec1")
    try { q1.processAllAvailable() } finally q1.stop()
    val afterFirst = spark.table("rec1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // second half lands while the query is DOWN; restart from checkpoint
    h2.write.mode("append").parquet(inDir)
    val q2 = startQuery("rec2")
    try { q2.processAllAvailable() } finally q2.stop()
    val afterRestart = spark.table("rec2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = all.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterRestart === batch,
      s"restarted totals $afterRestart != batch $batch (loss or double-count)")
    // and the first run really was partial
    assert(afterFirst.values.sum < batch.values.sum)
  }
}
