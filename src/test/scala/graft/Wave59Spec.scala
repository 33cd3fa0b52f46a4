package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-59 semantics: the branch merge's final state replays from the
  * closed-form edit rules; the knapsack selection is exactly the
  * greedy-density prefix and respects the budget. */
class Wave59Spec extends SparkSuite {

  test("sink_branch_merge: final state matches the closed-form rules") {
    val row = SparkEntry.queries("sink_branch_merge")(spark, sf).collect().head
    val base = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getAs[Number](0).longValue -> math.round(r.getDouble(1) * 100))
    val fin = base.filter { case (k, _) => !(k % 100 == 11 && k % 6 != 0) }
      .map { case (k, b) =>
        if (k % 6 == 0) b + 1000L
        else if (k % 10 == 0) b - 500L
        else b
      }
    val conflicts = base.count { case (k, _) =>
      k % 6 == 0 && (k % 10 == 0 || k % 100 == 11)
    }
    assert(row.getLong(0) === fin.length.toLong, "row count")
    assert(row.getLong(1) === fin.sum, "balance sum")
    assert(row.getLong(2) === conflicts.toLong, "conflict count")
  }

  test("corpus_knapsack: selection is the exact greedy-density prefix") {
    val rows = SparkEntry.queries("corpus_knapsack")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val tk = r.getString(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        (r.getLong(0), r.getString(1), tk.length.toLong, tk.distinct.length.toLong)
      }.filter(_._3 > 0)
    val budget = docs.map(_._3).sum / 2
    val ordered = docs
      .map { case (id, src, w, v) => (id, src, w, v, (2 * v * 1000000L + w) / (2 * w)) }
      .sortBy { case (id, _, _, _, dens) => (-dens, id) }
    var cum = 0L
    val selected = ordered.takeWhile { case (_, _, w, _, _) =>
      cum += w; cum <= budget
    }
    val expected = selected.groupBy(_._2).map { case (src, xs) =>
      src -> (xs.length.toLong, xs.map(_._3).sum, xs.map(_._4).sum)
    }
    assert(rows === expected)
    // budget respected, and adding the next doc would exceed it
    val used = selected.map(_._3).sum
    assert(used <= budget)
    if (selected.length < ordered.length)
      assert(used + ordered(selected.length)._3 > budget)
  }
}
