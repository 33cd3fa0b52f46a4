package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-49 semantics: KMV estimates land within theory error bounds of
  * the exact distincts they ride beside; the Markov steady state is a
  * fixpoint of its own transition matrix. */
class Wave49Spec extends SparkSuite {

  test("sketch_kmv_intersect: estimates within 3/sqrt(k) of exact") {
    val r = SparkEntry.queries("sketch_kmv_intersect")(spark, sf).head
    val estU = r.getLong(r.fieldIndex("est_union"))
    val exU = r.getLong(r.fieldIndex("exact_union"))
    val tol = 3.0 / math.sqrt(64.0) // ~37% at k=64, 3 sigma
    assert(math.abs(estU - exU) <= exU * tol + 5,
      s"union est $estU vs exact $exU")
    // per-set estimates also bounded
    val estA = r.getLong(r.fieldIndex("est_click"))
    val estB = r.getLong(r.fieldIndex("est_purchase"))
    val exact = Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(math.abs(estA - exact("click")) <= exact("click") * tol + 5)
    assert(math.abs(estB - exact("purchase")) <= exact("purchase") * tol + 5)
    // inclusion-exclusion consistency
    assert(r.getLong(r.fieldIndex("est_intersection")) === estA + estB - estU)
  }

  test("events_markov_steady: probabilities sum to ~1 and form a fixpoint") {
    val rows = SparkEntry.queries("events_markov_steady")(spark, sf).collect()
    assert(rows.nonEmpty)
    val pi = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = pi.values.sum
    assert(math.abs(total - 1.0) < 1e-3, s"sum $total")
    // build P locally and check pi * P ~= pi
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sec", "event_id")
    val trans = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("nt", lead("event_type", 1).over(w))
      .filter(col("nt").isNotNull)
      .groupBy("event_type", "nt").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2).toDouble))
      .toMap
    val states = pi.keySet
    val rowTot = states.map(s2 => s2 -> states.toSeq.map(d =>
      trans.getOrElse((s2, d), 0.0)).sum).toMap
    states.foreach { d =>
      val next = states.toSeq.map(s2 =>
        pi(s2) * trans.getOrElse((s2, d), 0.0) / rowTot(s2)).sum
      assert(math.abs(next - pi(d)) < 0.01, s"$d: piP=$next vs pi=${pi(d)}")
    }
  }
}
