package graft

import graft.engine.ConfScope

/** The session-conf override scope: mutual exclusion and restoration.
  * Pins the r10 fix for the capture/restore interleaving that left
  * `spark.sql.adaptive.enabled=false` on the shared session after the
  * parallel-writers spec (capture(true) / capture(false) /
  * restore(true) / restore(false)). */
class ConfScopeSpec extends SparkSuite {

  private val Key = "spark.sql.adaptive.enabled"

  test("concurrent scopes always restore the session's configured value") {
    val before = spark.conf.get(Key)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try {
          for (_ <- 1 to 25) {
            ConfScope.withConf(spark, Seq(Key -> "false")) {
              // inside the scope the override must be visible to THIS
              // holder (the lock guarantees no one else flipped it back)
              assert(spark.conf.get(Key) === "false")
              Thread.sleep(1)
            }
          }
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"scope thread failed: ${Option(errs.peek())}")
    assert(spark.conf.get(Key) === before,
      "interleaved scopes corrupted the session conf - the r10 race")
  }

  test("nested scopes restore LIFO, including unset keys") {
    val ghost = "spark.graft.confScopeSpec.ghost"
    assert(spark.conf.getOption(ghost).isEmpty)
    ConfScope.withConf(spark, Seq(Key -> "false", ghost -> "outer")) {
      assert(spark.conf.get(ghost) === "outer")
      ConfScope.withConf(spark, Seq(Key -> "true", ghost -> "inner")) {
        assert(spark.conf.get(Key) === "true")
        assert(spark.conf.get(ghost) === "inner")
      }
      // inner restored the outer scope's values, not the session's
      assert(spark.conf.get(Key) === "false")
      assert(spark.conf.get(ghost) === "outer")
    }
    assert(spark.conf.getOption(ghost).isEmpty,
      "a key absent before the scope must be UNSET after it, not set to a value")
  }
}
