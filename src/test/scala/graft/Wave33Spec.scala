package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-33 semantics: the A/A-style hash split must NOT fire the test,
  * LTV curves are monotone with a coverage tie-out, SNM finds exactly
  * the in-window high-Jaccard pairs. */
class Wave33Spec extends SparkSuite {

  test("events_ab_test: arms partition the users; the random split is not significant") {
    val row = SparkEntry.queries("events_ab_test")(spark, sf).head
    val nUsers = Tables.load(spark, sf, "events")
      .select(countDistinct("user_id")).head.getLong(0)
    assert(row.getLong(0) + row.getLong(2) === nUsers)
    assert(row.getLong(1) <= row.getLong(0) && row.getLong(3) <= row.getLong(2))
    // z consistent with its inputs
    val (na, ca, nb, cb) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(row.fieldIndex("z")) - z) < 1e-5)
    // the hash split is an A/A test: same behavior both arms — the
    // significance flag must agree with |z| and SHOULD be false here
    assert(row.getBoolean(row.fieldIndex("significant")) === (math.abs(z) > 1.96))
  }

  test("events_cohort_ltv: per-cohort curves are non-decreasing; users covered once") {
    val rows = SparkEntry.queries("events_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.load(spark, sf, "events")
      .select(countDistinct("user_id")).head.getLong(0)
    val perCohort = rows.groupBy(_.getLong(0)).view
      .mapValues(_.head.getLong(2)).values.sum
    assert(perCohort === nUsers)
    rows.groupBy(_.getLong(0)).foreach { case (_, cells) =>
      val curve = cells.sortBy(_.getLong(1)).map(_.getDouble(3))
      curve.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9, "LTV curve decreased")
        case _ => ()
      }
    }
  }

  test("dedup_sorted_neighborhood: pairs are exactly the in-window matches") {
    val rows = SparkEntry.queries("dedup_sorted_neighborhood")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // replay: sort by key, compare rank distance <= 2, jaccard >= 0.5
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), substring(lower(col("text")), 1, 24).as("k"),
        array_distinct(graft.ops.LlmPipeline.tokens(col("text"))).as("tk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toSet))
      .sortBy(d => (d._2, d._1))
    val expect = (for {
      i <- docs.indices
      j <- (i + 1) to math.min(i + 2, docs.length - 1)
      inter = (docs(i)._3 intersect docs(j)._3).size
      uni = (docs(i)._3 union docs(j)._3).size
      if inter * 2 >= uni
    } yield (math.min(docs(i)._1, docs(j)._1), math.max(docs(i)._1, docs(j)._1))).toSet
    assert(rows === expect)
  }
}
