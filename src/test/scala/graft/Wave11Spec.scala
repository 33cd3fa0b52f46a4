package graft

import org.apache.spark.sql.functions._

/** Wave-11 contracts: the ANN evaluator's metrics are well-formed and
  * consistent with their definitions, and AQE really splits the skewed
  * join partition under the query's settings. */
class Wave11Spec extends SparkSuite {

  test("eval_ann: one row per query; metrics in range; perfect-hit rows score ndcg 1") {
    val rows = SparkEntry.queries("eval_ann")(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val recall = r.getDouble(r.fieldIndex("recall"))
      val ndcg = r.getDouble(r.fieldIndex("ndcg"))
      val hits = r.getLong(r.fieldIndex("n_hits"))
      assert(recall >= 0.0 && recall <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      // binary relevance: a full top-10 of relevant docs IS the ideal list
      if (hits == 10L) assert(ndcg === 1.0)
      assert(recall === hits / 10.0)
    }
    // the multi-probe index is supposed to be usable — not a coin flip
    val meanRecall = rows.map(_.getDouble(rows.head.fieldIndex("recall"))).sum / 8
    assert(meanRecall >= 0.4, s"mean recall $meanRecall")
  }

  test("join_skew_aqe: AQE splits the hot partition (skew=true) and matches the plain plan") {
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    val (skewed, plan) =
      try {
        val df = ops.Wave11.skewJoinFrame(spark, sf).orderBy("band")
        val out = df.collect()
        (out, df.queryExecution.executedPlan.toString)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    assert(plan.contains("skew=true"), plan.take(3000))
    val plain = ops.Wave11.skewJoinFrame(spark, sf).orderBy("band").collect()
    assert(skewed.toSeq === plain.toSeq)
  }
}
