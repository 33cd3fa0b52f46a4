package graft

import org.apache.spark.sql.functions._

/** Store-level contracts of the three-clause MERGE
  * (VersionedStore.merge): clause semantics, atomicity, file-level
  * rewrite scope, and the absent-key delete no-op. */
class MergeConditionalSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new graft.engine.VersionedStore(
      graft.engine.Fs.freshScratch(spark, "mergecondspec"))

  test("delete/update/insert clauses apply in one commit; flag column stays out") {
    val store = freshStore()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    store.write(base, "t")
    val feed = Seq(
      (1L, "a", 10.0, "D"),   // matched delete
      (2L, "b2", 99.0, "U"),  // matched update
      (9L, "i", 1.0, "I"),    // unmatched insert
      (42L, "x", 0.0, "D"))   // unmatched delete: no-op
      .toDF("k", "name", "v", "op")
    val v = store.merge(spark, "t", feed, Seq("k"), f => f("op") === "D")
    assert(v === 2L)
    val out = store.read(spark, "t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out === Seq((2L, "b2", 99.0), (3L, "c", 30.0), (9L, "i", 1.0)))
    assert(!store.read(spark, "t").columns.contains("op"))
  }

  test("merge rewrites only hit files; null deleteWhen means keep") {
    val store = freshStore()
    val base = spark.range(1, 101).select(col("id").as("k"),
      (col("id") * 2).cast("double").as("v"))
    store.write(base.repartitionByRange(4, col("k")), "t")
    val v1Files = store.manifestWithStats("t", 1L)._2.map(_.file).toSet
    // feed touches only the low key range; op NULL on the update row
    val feed = Seq((1L, 0.0, "D"), (2L, 222.0, null.asInstanceOf[String]))
      .toDF("k", "v", "op")
    store.merge(spark, "t", feed, Seq("k"), f => f("op") === "D")
    val v2Files = store.manifestWithStats("t", 2L)._2.map(_.file).toSet
    val carried = v1Files.intersect(v2Files)
    assert(carried.nonEmpty, "untouched files must carry by reference")
    val out = store.read(spark, "t")
    assert(out.count() === 99L)                       // k=1 deleted
    assert(out.filter(col("k") === 2).head.getDouble(1) === 222.0) // null op -> update
    assert(store.history("t") === Seq(1L, 2L))
  }

  test("randomized model equivalence: merge matches the reference map semantics") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      val store = freshStore()
      val baseKeys = (0L to 30L).filter(_ => rnd.nextBoolean())
      val base = baseKeys.map(k => (k, rnd.nextInt(1000).toDouble))
      store.write(base.toDF("k", "v"), "t")
      val feedKeys = rnd.shuffle((0L to 40L).toList).take(15)
      val feed = feedKeys.map(k =>
        (k, rnd.nextInt(1000).toDouble, if (rnd.nextInt(3) == 0) "D" else "U"))
      store.merge(spark, "t", feed.toDF("k", "v", "op"), Seq("k"),
        f => f("op") === "D")
      // reference model: map update with conditional removal
      val model = scala.collection.mutable.Map(base.map(r => r._1 -> r._2): _*)
      feed.foreach {
        case (k, _, "D") => model.remove(k)
        case (k, v, _) => model(k) = v
      }
      val got = store.read(spark, "t").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === model.toMap, s"trial $trial diverged")
    }
  }

  test("guarded update: stale rows are dropped on the floor, replay is idempotent") {
    val store = freshStore()
    store.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "t")
    val feed = Seq((1L, 15.0), (2L, 5.0)).toDF("k", "v") // fresh, stale
    def applyFeed() = store.merge(spark, "t", feed, Seq("k"),
      deleteWhen = _ => lit(false),
      updateWhen = Some((t, s) => s("v") > t("v")))
    applyFeed()
    val out1 = store.read(spark, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out1 === Seq((1L, 15.0), (2L, 20.0)))
    applyFeed() // replaying the same old feed must change nothing
    val out2 = store.read(spark, "t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out2 === out1)
  }

  test("merge into a missing table refuses") {
    val store = freshStore()
    val feed = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      store.merge(spark, "missing", feed, Seq("k"), f => f("name") === "D")
    }
  }
}
