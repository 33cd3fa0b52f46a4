package graft

import org.apache.spark.sql.functions._

/** Wave-50 semantics: Shapley efficiency/symmetry axioms hold against a
  * local exact computation; 2-D histogram mass conserves. */
class Wave50Spec extends SparkSuite {

  test("events_shapley: efficiency axiom and local exact replay") {
    val rows = SparkEntry.queries("events_shapley")(spark, sf).collect()
    assert(rows.length === 4)
    val phis = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // local replay: build touch masks then exact Shapley over 16 subsets
    import graft.engine.Tables
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val psec = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val bitOf = Map("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)
    val masks = ev.filter(e => psec.contains(e._1) && e._3 < psec(e._1) &&
        e._2 != "purchase")
      .groupBy(_._1)
      .map { case (_, es) => es.map(e => bitOf(e._2)).reduce(_ | _) }
      .groupBy(identity).map { case (m, xs) => m -> xs.size.toLong }
    def v(sMask: Int): Long =
      masks.filter { case (m, _) => (m & sMask) == m }.values.sum
    val w24 = Array(6L, 2L, 2L, 6L)
    bitOf.foreach { case (c, b) =>
      val phi24 = (0 until 16).filter(s2 => (s2 & b) == 0).map { s2 =>
        w24(Integer.bitCount(s2)) * (v(s2 | b) - v(s2))
      }.sum
      assert(math.abs(phis(c) - phi24 / 24.0) < 1e-6, s"$c: ${phis(c)} vs ${phi24 / 24.0}")
    }
    // efficiency: sum of phis = v(full) - v(empty)
    assert(math.abs(phis.values.sum - (v(15) - v(0))) < 1e-6)
    // shares sum to ~1
    val shares = rows.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("profile_histogram2d: mass conserves and shares sum to 1") {
    val rows = SparkEntry.queries("profile_histogram2d")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(2)).sum
    val total = graft.engine.Tables.load(spark, sf, "lineitem").count()
    assert(n === total)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(1) >= 0))
  }
}
