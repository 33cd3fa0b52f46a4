package graft

import graft.engine.SessionCache

/** SessionCache: the shared session-map pattern (Materialize, IVF
  * centroids). Keying is on the SparkSession OBJECT — identity-hash
  * collisions are structurally impossible — and entries of stopped
  * sessions are purged on every lookup (the stop itself can't be driven
  * here: the test JVM shares one SparkContext across suites, and
  * SparkSession has no per-session stop — death means a stopped context,
  * which is exactly what the purge predicate checks). */
class SessionCacheSpec extends SparkSuite {

  test("getOrBuild memoizes per (session, key)") {
    val cache = new SessionCache[Object]()
    var builds = 0
    def build: Object = { builds += 1; new Object }
    val a = cache.getOrBuild(spark, "k")(build)()
    val b = cache.getOrBuild(spark, "k")(build)()
    assert(a eq b)
    assert(builds === 1)
    cache.getOrBuild(spark, "k2")(build)()
    assert(builds === 2)
  }

  test("sessions do not collide: same key, different session, different entry") {
    val cache = new SessionCache[String]()
    val other = spark.newSession()
    cache.getOrBuild(spark, "k")("from-root")()
    val v = cache.getOrBuild(other, "k")("from-other")()
    assert(v === "from-other", "second session must NOT see the first session's entry")
    assert(cache.liveSessionCount === 2)
  }

  test("invalidateAll disposes every entry and empties the cache") {
    val cache = new SessionCache[String]()
    cache.getOrBuild(spark, "a")("1")()
    cache.getOrBuild(spark, "b")("2")()
    var disposed = List.empty[String]
    cache.invalidateAll(v => disposed = v :: disposed)
    assert(disposed.toSet === Set("1", "2"))
    assert(cache.liveSessionCount === 0)
    var rebuilt = false
    cache.getOrBuild(spark, "a") { rebuilt = true; "1'" }()
    assert(rebuilt, "entries must be gone after invalidateAll")
  }

  test("ivf centroid cache is session-keyed (reuses SessionCache)") {
    // the cache object exists and is the shared type — training reuse is
    // pinned by IvfSpec; this guards the keying mechanism itself
    val c: SessionCache[Array[(Int, Array[Float])]] = graft.ops.Ivf.centroidCache
    assert(c.liveSessionCount >= 0)
  }
}
