package graft

import org.apache.spark.sql.functions._

/** Throwaway in-JVM timing probe (not part of the library surface).
  * Times candidate decompositions/variants of hot bench queries so
  * optimization is measurement-driven. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local("graft-probe")
    import graft.engine.Tables
    import graft.ops.Profiler

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    // warm the JVM + parquet footers on something representative
    time("warmup: full profile_histogram") {
      Profiler.profileHistogram(spark, dir).count()
    }

    time("melt only (scan+expand+render)") {
      Tables.all.map(Profiler.melt(spark, dir, _)).reduce(_ union _).count()
    }
    time("melt+agg (one shuffle)") {
      Tables.all.map(Profiler.melt(spark, dir, _)).reduce(_ union _)
        .groupBy("tableName", "columnName", "value")
        .agg(count(lit(1)).cast("float").as("num_records"))
        .count()
    }
    time("full profile_histogram (warm)") {
      Profiler.profileHistogram(spark, dir).count()
    }
    time("full again") {
      Profiler.profileHistogram(spark, dir).count()
    }

    // variant: integer colId through the shuffle instead of 2 string keys
    def intKeyHistogram(): Long = {
      import spark.implicits._
      val metas = Tables.all
      val ids = (for (t <- metas; c <- t.atomicCols) yield (t.name, c.name)).zipWithIndex.toMap
      val melted = metas.map { tm =>
        val df = Tables.balanced(spark, Tables.load(spark, dir, tm.name))
        df.select(tm.atomicCols.map(c => Profiler.fmtValue(c).as(c.name)): _*)
          .unpivot(Array.empty[org.apache.spark.sql.Column],
            tm.atomicCols.map(c => col(c.name)).toArray, "columnName", "value")
          .select(
            // map columnName string -> int id via a chained when (small, codegen-able)
            tm.atomicCols.tail.foldLeft(when(col("columnName") === tm.atomicCols.head.name,
              lit(ids((tm.name, tm.atomicCols.head.name))))) { (acc, c) =>
              acc.when(col("columnName") === c.name, lit(ids((tm.name, c.name))))
            }.as("colId"),
            col("value"))
      }.reduce(_ union _)
      val lookup = (for (t <- metas; c <- t.atomicCols)
        yield (ids((t.name, c.name)), t.name, c.name, c.sparkType))
        .toDF("colId", "tableName", "columnName", "dataType")
      melted.groupBy("colId", "value")
        .agg(count(lit(1)).cast("float").as("num_records"))
        .join(broadcast(lookup), "colId")
        .select(lit("graft").as("databaseName"), col("tableName"), col("columnName"),
          col("dataType"), col("value"), col("num_records"),
          length(col("value")).cast("float").as("len"))
        .orderBy(col("tableName"), col("columnName"), col("value"))
        .count()
    }
    time("int-key variant") { intKeyHistogram() }
    time("int-key variant again") { intKeyHistogram() }

    // variant: whole-stage codegen ON (per-row melt work is 9M+ rows at
    // sf0.1 — enough to amortize JIT even in a one-shot JVM?)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("codegen-on full") { Profiler.profileHistogram(spark, dir).count() }
    time("codegen-on full again") { Profiler.profileHistogram(spark, dir).count() }
    time("codegen-on int-key") { intKeyHistogram() }
    time("codegen-on int-key again") { intKeyHistogram() }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.stop()
  }
}
