package graft

import org.apache.spark.sql.functions._

/** Throwaway in-JVM timing probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val b = graft.engine.GraftSession.tuned(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .withExtensions(new graft.engine.GraftExtensions)
        .appName("graft-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.codegen.wholeStage", "false")
        .config("spark.shuffle.compress", sys.env.getOrElse("PROBE_SHUF_COMPRESS", "true"))
        .config("spark.shuffle.spill.compress", sys.env.getOrElse("PROBE_SHUF_COMPRESS", "true"))
        .config("spark.ui.enabled", "false"))
      val ss = b.getOrCreate(); ss.sparkContext.setLogLevel("WARN"); ss
    }
    import graft.engine.Tables
    import graft.ops.Profiler

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    spark.sql("SET -v").filter(col("key").contains("skipPartial") ||
      col("key").contains("PartialAggregat")).show(20, false)

    time("warmup: full profile_histogram") {
      Profiler.profileHistogram(spark, dir).count()
    }
    time("baseline full (warm)") { Profiler.profileHistogram(spark, dir).count() }

    // knob: more shuffle partitions for the big agg
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    time("shuffle-partitions-128") { Profiler.profileHistogram(spark, dir).count() }
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    // derived summary: compute summary FROM the histogram aggregate rather
    // than a second melt+agg (count/sum/max over 1.37M pre-aggregated rows)
    time("summary baseline (own melt)") { Profiler.profileSummary(spark, dir).count() }
    time("summary derived from histogram") {
      val hist = Tables.all.map(Profiler.melt(spark, dir, _)).reduce(_ union _)
        .groupBy("tableName", "columnName", "value")
        .agg(count(lit(1)).as("cnt"))
      hist.groupBy("tableName", "columnName")
        .agg(count(lit(1)).as("ndv"), sum("cnt").as("n_rows"),
          sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
          max("cnt").as("modal_freq"))
        .orderBy("tableName", "columnName").count()
    }

    // persisted histogram reuse: materialize once, then histogram+summary+topk
    val agg = Tables.all.map(Profiler.melt(spark, dir, _)).reduce(_ union _)
      .groupBy("tableName", "columnName", "value")
      .agg(count(lit(1)).cast("float").as("num_records"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize histogram agg") { agg.count() }
    time("histogram from cache (sort+join)") {
      agg.orderBy("tableName", "columnName", "value").count()
    }
    time("summary from cache") {
      agg.groupBy("tableName", "columnName")
        .agg(count(lit(1)).as("ndv"),
          sum(col("num_records").cast("long")).as("n_rows"),
          max(col("num_records").cast("long")).as("modal_freq"))
        .count()
    }
    agg.unpersist()
    spark.stop()
  }
}
