package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranks

/** The two-phase distributed rank must be BYTE-identical to the
  * single-partition window form it replaces — on the real fixture and
  * on a frame with one overwhelmingly dominant group (the skew case the
  * rewrite exists for). */
class RanksSpec extends SparkSuite {

  private def windowForm(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("rk_w", row_number().over(
      Window.partitionBy("lang").orderBy(col("mean_lp"), col("doc_id"))))
    .withColumn("n_w", count(lit(1)).over(Window.partitionBy("lang")))
    .withColumn("stage_w", ntile(4).over(
      Window.partitionBy("lang").orderBy(col("mean_lp"), col("doc_id"))))

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val two = Ranks.perGroupRank(df, Seq("lang"),
      Seq(col("mean_lp"), col("doc_id")), "rk", "n_lang", partitions = 7)
      .withColumn("stage", Ranks.ntileExpr(col("rk"), col("n_lang"), 4))
    // join on doc_id alone (unique in every test frame): a lang-keyed
    // USING join would silently skip NULL-group rows from the diff
    val diff = two.drop("lang", "mean_lp").join(windowForm(df), Seq("doc_id"))
      .filter(col("rk") =!= col("rk_w") || col("n_lang") =!= col("n_w") ||
        col("stage") =!= col("stage_w"))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("two-phase per-group rank + closed-form ntile == the window form on the fixture") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val scored = graft.ops.Wave5.unigramLp(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    compare(scored)
  }

  test("two-phase rank survives one dominant group spanning many partitions") {
    import spark.implicits._
    // 997 of 1009 rows in ONE group: the window form serializes this
    // group into a single task; the range form spreads it over 7
    val rows = (1L to 997L).map(i => ("en", i, (i % 13).toDouble)) ++
      (1L to 12L).map(i => ("fr", 10000L + i, i.toDouble))
    compare(rows.toDF("lang", "doc_id", "mean_lp"))
  }

  test("two-phase prefix sum == the running-window form, including one dominant group") {
    import spark.implicits._
    val rows = (1L to 997L).map(i => ("en", i, (i % 7) + 1L)) ++
      (1L to 12L).map(i => ("fr", 10000L + i, i))
    val df = rows.toDF("lang", "doc_id", "n_tok")
    val two = Ranks.perGroupPrefixSum(df, Seq("lang"), Seq(col("doc_id")),
      col("n_tok"), "cum", partitions = 7)
    val win = df.withColumn("cum_w", sum("n_tok").over(
      Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val diff = two.join(win, Seq("lang", "doc_id"))
      .filter(col("cum") =!= col("cum_w"))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("two-phase rank keeps NULL group keys (null-safe offset join == window form)") {
    import spark.implicits._
    // the window form puts all NULL-lang rows in one partition group; a
    // plain USING offset join would silently drop them
    val rows = (1L to 40L).map(i => (if (i % 4 == 0) null else s"l${i % 3}", i, i.toDouble))
    compare(rows.toDF("lang", "doc_id", "mean_lp"))
  }

  test("empty-group (global) rank == the global window form — the text_rarity shape") {
    import spark.implicits._
    val df = (1L to 1009L).map(i => (i, (i * 37 % 101).toDouble))
      .toDF("doc_id", "score")
    val two = Ranks.perGroupRank(df, Seq.empty,
      Seq(col("score").desc, col("doc_id").asc), "rk", "n_all", partitions = 7)
    val win = df.withColumn("rk_w", row_number().over(
      Window.orderBy(col("score").desc, col("doc_id").asc)).cast("bigint"))
    val diff = two.join(win, Seq("doc_id"))
      .filter(col("rk") =!= col("rk_w") || col("n_all") =!= lit(1009L))
    assert(diff.count() === 0)
    assert(two.count() === 1009L)
  }

  test("two-phase rank fails loudly when (partition x group) exceeds the offset bound") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (s"g$i", i, i.toDouble))
      .toDF("lang", "doc_id", "mean_lp")
    val e = intercept[IllegalArgumentException] {
      Ranks.perGroupRank(df, Seq("lang"),
        Seq(col("mean_lp"), col("doc_id")), "rk", "n_lang",
        partitions = 7, maxOffsetEntries = 50).count()
    }
    assert(e.getMessage.contains("not driver-bounded"))
  }

  test("fused prefix sum+min == the two window forms, negatives and a dominant group") {
    import spark.implicits._
    // signed values so the running min genuinely dips below both zero
    // and earlier partition minima; one group spans most partitions
    val rows = (1L to 997L).map(i => ("en", i, ((i * 13) % 23) - 11L)) ++
      (1L to 12L).map(i => ("fr", 10000L + i, i - 6L))
    val df = rows.toDF("lang", "doc_id", "v")
    val two = Ranks.perGroupPrefixSumMin(df, Seq("lang"), Seq(col("doc_id")),
      col("v"), "cum", "pmin", partitions = 7)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val win = df
      .withColumn("cum_w", sum("v").over(w))
      .withColumn("pmin_w", min(col("cum_w")).over(w))
    val diff = two.join(win, Seq("lang", "doc_id"))
      .filter(col("cum") =!= col("cum_w") || col("pmin") =!= col("pmin_w"))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("fused rank+prefix-sum == the window forms incl. group totals") {
    import spark.implicits._
    val rows = (1L to 997L).map(i => ("en", i, (i % 7) + 1L)) ++
      (1L to 12L).map(i => ("fr", 10000L + i, i))
    val df = rows.toDF("lang", "doc_id", "v")
    val two = Ranks.perGroupRankAndPrefixSum(df, Seq("lang"),
      Seq(col("doc_id")), col("v"), "rk", "n", "cum", "sn", partitions = 7)
    val wOrd = Window.partitionBy("lang").orderBy("doc_id")
    val win = df
      .withColumn("rk_w", row_number().over(wOrd).cast("bigint"))
      .withColumn("n_w", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("cum_w", sum("v").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sn_w", sum("v").over(Window.partitionBy("lang")))
    val diff = two.join(win, Seq("lang", "doc_id"))
      .filter(col("rk") =!= col("rk_w") || col("n") =!= col("n_w") ||
        col("cum") =!= col("cum_w") || col("sn") =!= col("sn_w"))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("lead kernel == the lead window form, incl. NULL groups and a dominant group") {
    import spark.implicits._
    // two-column order with a duplicate-heavy leading key: the kernel's
    // partition-head pick (min_by over the order struct) must break
    // ties exactly like the window's lexicographic sort
    val rows = (1L to 997L).map(i =>
      (if (i % 5 == 0) null else "en", i % 13, i, i * 3L)) ++
      (1L to 12L).map(i => ("fr", i % 3, 10000L + i, i * 7L))
    val df = rows.toDF("lang", "bucket", "doc_id", "v")
    val two = Ranks.perGroupLead(df, Seq("lang"),
      Seq(col("bucket"), col("doc_id")), col("v"), "nxt", partitions = 7)
    val win = df.withColumn("nxt_w", lead(col("v"), 1).over(
      Window.partitionBy("lang").orderBy("bucket", "doc_id")))
    val diff = two.join(win, Seq("doc_id"))
      .filter(!(col("nxt") <=> col("nxt_w")))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("rank with a duplicate-order-key run spanning partition boundaries") {
    import spark.implicits._
    // 600 rows share ONE order value (ties broken only by doc_id): the
    // range partitioner must split the run across partitions and the
    // offsets must still reconstruct the exact global ranks
    val rows = (1L to 600L).map(i => ("en", i, 42.0)) ++
      (601L to 700L).map(i => ("en", i, (i % 9).toDouble))
    compare(rows.toDF("lang", "doc_id", "mean_lp"))
  }

  test("closed-form ntile matches SQL ntile bucket sizes for n not divisible by k") {
    import spark.implicits._
    val df = (1L to 10L).map(r => (r, 10L)).toDF("rk", "n")
    val got = df.select(Ranks.ntileExpr(col("rk"), col("n"), 4).as("b"))
      .as[Int].collect().toSeq
    assert(got === Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
  }
}
