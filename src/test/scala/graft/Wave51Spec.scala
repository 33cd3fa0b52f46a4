package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-51 semantics: schema-merged reads null-fill exactly the v1
  * rows; PERMISSIVE capture loses no line and flags exactly the
  * malformed ones. */
class Wave51Spec extends SparkSuite {

  test("source_merge_schema: v1 rows null-fill, totals conserve") {
    val rows = SparkEntry.queries("source_merge_schema")(spark, sf).collect()
    assert(rows.length === 2)
    val base = Tables.load(spark, sf, "customer")
    val total = base.count()
    assert(rows.map(_.getLong(1)).sum === total)
    val evens = base.filter(pmod(col("c_custkey"), lit(2)) === 0).count()
    val v1 = rows.find(_.getBoolean(0)).get
    assert(v1.getLong(1) === evens, "v1 (null-segment) row count != even keys")
  }

  test("source_corrupt_json: counts partition the corpus exactly") {
    val r = SparkEntry.queries("source_corrupt_json")(spark, sf).head
    val docs = Tables.load(spark, sf, "documents")
    val total = docs.count()
    val bad = docs.filter(pmod(col("doc_id"), lit(7)) === 0).count()
    assert(r.getLong(r.fieldIndex("n_good")) === total - bad)
    assert(r.getLong(r.fieldIndex("n_bad")) === bad)
    assert(r.getLong(r.fieldIndex("chars_good")) > 0)
  }
}
