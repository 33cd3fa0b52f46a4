package graft

import org.apache.spark.sql.functions._

/** Wave-17 semantics: the interleave is a valid round-robin — positions
  * are unique, and while every source still has documents the stream
  * strictly cycles through all of them. */
class Wave17Spec extends SparkSuite {

  test("corpus_interleave: unique positions; full cycles while all sources last") {
    val rows = SparkEntry.queries("corpus_interleave")(spark, sf)
      .orderBy("pos").collect()
    assert(rows.nonEmpty)
    val pos = rows.map(r => r.getLong(r.fieldIndex("pos")))
    assert(pos.distinct.length === pos.length, "positions must be unique")
    val bySource = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    val k = bySource.size
    val minCount = bySource.values.min
    // while every source still has docs, each k-cycle holds k distinct sources
    rows.take(minCount * k).grouped(k).foreach { cycle =>
      assert(cycle.map(_.getString(1)).distinct.length === k,
        cycle.map(_.getString(1)).mkString(","))
    }
  }
}
