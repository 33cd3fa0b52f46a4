package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-36 semantics: Cramér's V is a bounded association coefficient
  * consistent with a local χ² replay; joinability surfaces the TPC-H
  * foreign keys with containment exactly 1.0. */
class Wave36Spec extends SparkSuite {

  test("profile_cramers_v: V in [0,1], chi2 matches a local contingency replay") {
    val rows = SparkEntry.queries("profile_cramers_v")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0 + 1e-9,
        s"${r.getString(0)} v=${r.getDouble(5)}")
      // v consistent with its own chi2/n/r/c columns
      val v = math.sqrt(r.getDouble(4) /
        (r.getLong(1) * (math.min(r.getLong(2), r.getLong(3)) - 1.0)))
      assert(math.abs(r.getDouble(5) - v) < 1e-5)
    }
    // local replay of the documents pair
    val cells = Tables.load(spark, sf, "documents")
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum.toDouble }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum.toDouble }
    val chi2 = cells.map { case ((a, b), o) =>
      val e = rt(a) * ct(b) / n
      math.pow(o - e, 2) / e
    }.sum
    val doc = rows.find(_.getString(0).startsWith("documents")).get
    assert(math.abs(doc.getDouble(4) - chi2) < 1e-3, s"${doc.getDouble(4)} vs $chi2")
  }

  test("profile_joinability: TPC-H FK sides are fully contained (cont = 1.0)") {
    val rows = SparkEntry.queries("profile_joinability")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (ndvA, ndvB, inter) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(inter <= math.min(ndvA, ndvB))
      // every declared pair is a true FK child~parent or parent~child:
      // the child side's values are all present in the parent side
      assert(r.getDouble(4) === 1.0 || r.getDouble(5) === 1.0,
        s"${r.getString(0)}: no side fully contained")
    }
    // direction check on one known pair: lineitem.l_orderkey ⊆ orders.o_orderkey
    val lo = rows.find(_.getString(0) == "orders.o_orderkey~lineitem.l_orderkey").get
    assert(lo.getDouble(5) === 1.0, "l_orderkey not contained in o_orderkey")
  }
}
