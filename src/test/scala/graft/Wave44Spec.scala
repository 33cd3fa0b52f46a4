package graft

import org.apache.spark.sql.functions._

/** Wave-44 semantics: elasticity slope replays against Spark's own
  * regr_slope; Holm adjusted p's are monotone, ≥ raw p, and step-down
  * consistent; the sync merge deletes exactly the in-scope keys
  * missing from the snapshot and out-of-scope segments are untouched. */
class Wave44Spec extends SparkSuite {

  test("price_elasticity: slope matches regr_slope on the same pairs") {
    val rows = SparkEntry.queries("price_elasticity")(spark, sf).collect()
    assert(rows.nonEmpty)
    import graft.engine.Tables
    val ref = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        log(col("l_extendedprice").cast("double") / col("l_quantity").cast("double"))
          .as("lx"),
        log(col("l_quantity").cast("double")).as("ly"))
      .groupBy("p_brand")
      .agg(expr("regr_slope(ly, lx)").as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val got = r.getDouble(r.fieldIndex("elasticity"))
      val want = ref(r.getString(0))
      assert(math.abs(got - want) < 1e-4, s"${r.getString(0)}: $got vs $want")
    }
  }

  test("events_holm: p_holm monotone in p-rank, >= p, step-down consistent") {
    val rows = SparkEntry.queries("events_holm")(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.length
    rows.foreach { r =>
      val p = r.getDouble(r.fieldIndex("p"))
      val ph = r.getDouble(r.fieldIndex("p_holm"))
      assert(p >= 0.0 && p <= 1.0 + 1e-9, s"p out of range: $p")
      assert(ph >= p - 1e-9 && ph <= 1.0 + 1e-9, s"p_holm $ph vs p $p")
    }
    // sorted by raw p, the adjusted p's must be non-decreasing and each
    // >= (m - i) * p_i (the step-down factor at its rank)
    val byP = rows.sortBy(r => (r.getDouble(r.fieldIndex("p")), r.getString(0)))
    var prev = 0.0
    byP.zipWithIndex.foreach { case (r, i) =>
      val p = r.getDouble(r.fieldIndex("p"))
      val ph = r.getDouble(r.fieldIndex("p_holm"))
      assert(ph >= prev - 1e-9, "p_holm not monotone")
      assert(ph >= math.min(1.0, (m - i) * p) - 1e-6, s"step-down factor at rank $i")
      prev = ph
    }
  }

  test("sink_merge_sync: scoped deletes only; other segments byte-identical") {
    val df = SparkEntry.queries("sink_merge_sync")(spark, sf)
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    import graft.engine.Tables
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("acctbal"))
    val want = base
      .filter(col("c_mktsegment") =!= "BUILDING" ||
        pmod(col("c_custkey"), lit(2)) === 0)
      .withColumn("acctbal",
        when(col("c_mktsegment") === "BUILDING", col("acctbal") + lit(100))
          .otherwise(col("acctbal")).cast("decimal(18,2)"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("ks"),
        sum("acctbal").cast("double").as("bs"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (seg, (n, ks, bs)) =>
      val (wn, wks, wbs) = want(seg)
      assert(n === wn && ks === wks, s"$seg row mismatch")
      assert(math.abs(bs - wbs) < 1e-6, s"$seg balance mismatch")
    }
  }
}
