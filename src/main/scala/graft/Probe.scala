package graft

/** Throwaway in-JVM timing probe (not part of the library surface).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Probe <query> ..."
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local("graft-probe")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (q <- args) {
      time(s"$q cold") { SparkEntry.queries(q)(spark, dir).count() }
      time(s"$q warm") { SparkEntry.queries(q)(spark, dir).count() }
    }
    spark.stop()
  }
}
