package graft

/** Dev-side targeted timer: `runMain graft.TimeQ <sfDir> <name ...>`
  * runs each named SparkEntry query three times (cold + 2 warm) and
  * prints per-pass seconds — the quick feedback loop for single-query
  * perf work without paying a full Bench sweep. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.engine.GraftSession.local("graft-timeq")
    for (n <- names) {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $n%-32s " +
        secs.map(s => f"$s%7.2f").mkString(" "))
    }
    spark.stop()
  }
}
