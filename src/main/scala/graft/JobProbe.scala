package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-side job profiler: `runMain graft.JobProbe <sfDir> <name>` runs
  * one query with a listener and prints per-job wall times + callsites
  * — where an iterative query's seconds actually go. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.engine.GraftSession.local("graft-jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    // warm pass
    SparkEntry.queries(name)(spark, sfDir).count()
    // listener thread writes, main thread reads after removeListener —
    // synchronize on `rows`; `properties` is null for jobs submitted
    // without local properties
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.Buffer[(Int, Double, String)]()
    val l = new SparkListener {
      private def prop(j: SparkListenerJobStart, k: String): Option[String] =
        Option(j.properties).flatMap(p => Option(p.getProperty(k)))
      override def onJobStart(j: SparkListenerJobStart): Unit =
        rows.synchronized {
          starts(j.jobId) = (j.time,
            prop(j, "spark.job.description")
              .orElse(prop(j, "callSite.short")).getOrElse("?"))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        rows.synchronized {
          starts.remove(j.jobId).foreach { case (t0, d) =>
            rows += ((j.jobId, (j.time - t0) / 1e3, d))
          }
        }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(l)
    Thread.sleep(500)
    val snap = rows.synchronized(rows.toList)
    snap.sortBy(_._1).foreach { case (id, s, d) =>
      println(f"[job] $id%4d $s%7.2fs  ${d.take(90)}")
    }
    println(f"[job] total=$total%.2fs jobs=${snap.size} " +
      f"sum=${snap.map(_._2).sum}%.2fs")
    spark.stop()
  }
}
