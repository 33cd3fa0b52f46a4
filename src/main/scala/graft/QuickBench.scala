package graft

/** Throwaway dev tool: time a named subset of SparkEntry.queries in one
  * JVM (warm-up + timed pass each). Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.QuickBench q1 q2 ... */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local("graft-quickbench")
    for (name <- args; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[quick] $name%-30s pass$pass ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
