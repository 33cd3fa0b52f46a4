package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-62 semantics: the reproducibility audit distinguishes pinned
  * from head recomputes; grid-join results replay from a local
  * all-pairs ε-box scan (proving the grid reduction complete). */
class Wave62Spec extends SparkSuite {

  test("sink_reproducible_build: pinned reproduces, head does not") {
    val rows = SparkEntry.queries("sink_reproducible_build")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("pinned_reproduces")),
        "derived table must reproduce from the pinned input version")
      assert(!r.getBoolean(r.fieldIndex("head_reproduces")),
        "recompute from HEAD must differ after the source moved")
    }
    // derived stats equal the base aggregation
    val base = Tables.load(spark, sf, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(c_acctbal * 100) as long)")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert(base(r.getString(0)) === ((r.getLong(1), r.getLong(2))))
    }
  }

  test("join_grid_neighbors: replays from a local all-pairs epsilon-box scan") {
    val row = SparkEntry.queries("join_grid_neighbors")(spark, sf).collect().head
    val li = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part")
        .filter(col("p_brand") === "Brand#2").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(round(l_extendedprice * 100) as long)").as("pc"),
        expr("cast(floor(unix_timestamp(l_shipdate) / 86400) as long)").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3)))
    var n = 0L; var pd = 0L; var dd = 0L
    for (i <- li.indices; j <- li.indices) {
      val (a, b) = (li(i), li(j))
      val lt = (a._1, a._2, a._3, a._4)
      val rt = (b._1, b._2, b._3, b._4)
      if (Ordering[(Long, Long, Long, Long)].lt(lt, rt) &&
          math.abs(a._3 - b._3) <= 100000 && math.abs(a._4 - b._4) <= 14) {
        n += 1; pd += math.abs(a._3 - b._3); dd += math.abs(a._4 - b._4)
      }
    }
    assert(n > 0, "fixture must contain qualifying pairs")
    assert(row.getLong(0) === n, s"pair count ${row.getLong(0)} vs $n")
    assert(row.getLong(1) === pd)
    assert(row.getLong(2) === dd)
  }
}
