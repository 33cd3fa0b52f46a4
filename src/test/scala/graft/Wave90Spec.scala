package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-90 semantics: the DQ gates replay from local exact counts. */
class Wave90Spec extends SparkSuite {

  test("dq_expectations: local constraint replay over orders") {
    val out = SparkEntry.queries("dq_expectations")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out.size === 9)
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    val n = ord.length.toLong
    val uq = n - ord.map(_.getLong(0)).distinct.length
    val acc = ord.count(r => !Set("O", "F", "P")(r.getString(1))).toLong
    val rng = ord.count(_.getDouble(2) <= 0).toLong
    assert(out(("orders", "o_orderkey", "not_null")) === ((n, 0L, true)))
    assert(out(("orders", "o_orderkey", "unique")) === ((n, uq, uq == 0L)))
    assert(out(("orders", "o_orderstatus", "accepted_values"))
      === ((n, acc, acc == 0L)))
    assert(out(("orders", "o_totalprice", "range_positive"))
      === ((n, rng, rng == 0L)))
    // every reported check carries the full row count of its table
    out.foreach { case ((tbl, _, _), (nr, _, _)) =>
      assert(nr > 0L, tbl) }
  }

  test("dq_referential: orphan counts match local anti-join replay") {
    val out = SparkEntry.queries("dq_referential")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size === 6)
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val parts = Tables.load(spark, sf, "part")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val orphOrd = li.count(r => !orders(r.getLong(0))).toLong
    val orphPart = li.count(r => !parts(r.getLong(1))).toLong
    assert(out("lineitem.l_orderkey->orders")
      === ((li.length.toLong, orphOrd, orphOrd == 0L)))
    assert(out("lineitem.l_partkey->part")
      === ((li.length.toLong, orphPart, orphPart == 0L)))
    out.values.foreach { case (cr, orph, pass) =>
      assert(cr > 0L); assert(pass === (orph == 0L)) }
  }

  test("dq_freshness: staleness vs high-water mark, local replay") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(floor(unix_timestamp(ts) / 86400) as long)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val now = ev.map(_._2).max
    val out = SparkEntry.queries("dq_freshness")(spark, sf).collect()
    assert(out.length === ev.map(_._1).distinct.length)
    out.foreach { r =>
      val tpe = r.getString(0)
      val mine = ev.filter(_._1 == tpe)
      assert(r.getLong(1) === mine.length.toLong)
      assert(r.getLong(2) === mine.map(_._2).max)
      assert(r.getLong(3) === now - mine.map(_._2).max)
      assert(r.getBoolean(4) === (r.getLong(3) <= 7))
    }
  }
}
