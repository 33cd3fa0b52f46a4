package graft

import org.apache.spark.sql.functions._

/** Dev-side throwaway: phase-level timing of the VersionedStore commit
  * path (write / upsert / read), mirroring sink_ivm_join's store use.
  * `runMain graft.StoreProbe <sfDir>` */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.engine.GraftSession.local("graft-storeprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warm the IO/codegen paths once
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val root = graft.engine.Fs.freshScratch(spark, s"storeprobe$pass")
      val store = new graft.engine.VersionedStore(root)
      val o = graft.engine.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      val c = graft.engine.Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val isBase = coalesce(pmod(col("o_orderkey"), lit(2)) === 0, lit(true))
      time("write orders") {
        store.write(o.filter(isBase).repartitionByRange(4, col("o_orderkey")), "orders")
      }
      time("write customer") {
        store.write(c.repartitionByRange(4, col("c_custkey")), "customer")
      }
      time("read+read") {
        store.read(spark, "orders").count(); store.read(spark, "customer").count()
      }
      time("upsert orders") {
        store.upsert(spark, "orders", o.filter(!isBase), Seq("o_orderkey"))
      }
      time("upsert customer") {
        store.upsert(spark, "customer",
          c.filter(pmod(col("c_custkey"), lit(5)) === 0)
            .withColumn("c_mktsegment", lit("VIP")), Seq("c_custkey"))
      }
      time("changesSince") {
        store.changesSince(spark, "orders", 1L, Seq("o_orderkey")).count()
      }
      time("newFileRows") {
        store.newFileRows(spark, "orders", 1L).count()
      }
      time("final read") { store.read(spark, "orders").count() }
      time("trivial job x5") { (1 to 5).foreach(_ => spark.range(16).count()) }
      val ckpt = spark.range(1000).toDF("k").localCheckpoint()
      time("bcast-build x3") { (1 to 3).foreach { _ =>
        org.apache.spark.sql.functions.broadcast(ckpt)
          .join(ckpt.withColumnRenamed("k", "k2"),
            col("k") === col("k2"), "left_semi").count() } }
    }
    spark.stop()
  }
}
