package graft.engine

import org.apache.spark.sql.SparkSession

/** Mutually-exclusive session-conf override scope.
  *
  * `spark.conf.set` is SESSION-GLOBAL: two threads that each
  * capture-set-restore the same key (a streaming micro-batch MERGE and a
  * foreground query's fixed-shape loop, or two concurrent writers in the
  * tiny-merge fast path) can interleave as capture(true) / capture(false)
  * / restore(true) / restore(false) — leaving the session PERMANENTLY on
  * the override. Observed exactly so in the parallel-writers spec: one
  * unlucky run left `spark.sql.adaptive.enabled=false` for every later
  * suite. All engine conf-override scopes therefore serialize through
  * this one JVM-wide monitor — overrides are short (a staging write, a
  * model-state loop) and single-threaded in the bench, so the lock is
  * uncontended there; under genuine writer concurrency it trades a
  * little parallelism of TINY jobs for a session that always ends in its
  * configured state.
  */
object ConfScope {
  private val lock = new Object

  def withConf[A](s: SparkSession, overrides: Seq[(String, String)])
      (body: => A): A = lock.synchronized {
    val before = overrides.map { case (k, _) =>
      k -> s.conf.getOption(k)
    }
    overrides.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally before.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** [[withConf]] whose overrides DERIVE from baseline conf values, with
    * the baseline read UNDER THE LOCK (r10 ADVICE): read outside, a
    * caller could capture another scope's transient override (e.g. a
    * tiny-merge's 1-partition width) as "the session's configured
    * value" and pin a whole model-state loop to it. `baseline` keys are
    * also registered for restoration (bodies may re-set them — e.g. the
    * superstep width), exactly like overridden keys. The baseline map is
    * passed to both `overridesFor` and `body`. */
  def withConfFrom[A](s: SparkSession, baseline: Seq[String])
      (overridesFor: Map[String, String] => Seq[(String, String)])
      (body: Map[String, String] => A): A = lock.synchronized {
    val base = baseline.map(k => k -> s.conf.get(k)).toMap
    val overrides = overridesFor(base)
    val before = (overrides.map(_._1) ++ baseline).distinct
      .map(k => k -> s.conf.getOption(k))
    overrides.foreach { case (k, v) => s.conf.set(k, v) }
    try body(base)
    finally before.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
