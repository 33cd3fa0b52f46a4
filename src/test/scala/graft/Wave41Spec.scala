package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-41 semantics: CUPED's identities hold (ρ² reduction, linear
  * adjustment consistency); subgroup z-scores reconcile with their own
  * cell means and the n-weighted deviations sum to ~0. */
class Wave41Spec extends SparkSuite {

  test("events_cuped: var_reduction = rho^2 in [0,1); deltas consistent with moments") {
    val row = SparkEntry.queries("events_cuped")(spark, sf).head
    val vr = row.getDouble(row.fieldIndex("var_reduction"))
    assert(vr >= 0.0 && vr < 1.0, s"var_reduction $vr")
    // local replay of the user-level moments
    def foldOf(uid: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((uid.toString + ":ab").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val users = ev.groupBy(_._1).map { case (uid, es) =>
      (foldOf(uid),
        es.filter(_._2 <= mid).map(_._3).sum,
        es.filter(_._2 > mid).map(_._3).sum)
    }.toArray
    val n = users.length.toDouble
    val sp = users.map(_._2).sum.toDouble
    val so = users.map(_._3).sum.toDouble
    val spo = users.map(u => BigInt(u._2) * BigInt(u._3)).sum.toDouble
    val spp = users.map(u => BigInt(u._2) * BigInt(u._2)).sum.toDouble
    val cov = (spo - sp * so / n) / (n - 1)
    val varp = (spp - sp * sp / n) / (n - 1)
    val theta = cov / varp
    assert(math.abs(row.getDouble(row.fieldIndex("theta")) - theta) < 1e-3)
    val a = users.filter(_._1 == 0); val b = users.filter(_._1 == 1)
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    val raw = (a.map(_._3).sum.toDouble / a.length -
      b.map(_._3).sum.toDouble / b.length) / 1e6
    assert(math.abs(row.getDouble(row.fieldIndex("raw_delta")) - raw) < 1e-4)
    // linearity: cuped_delta = raw_delta - theta * (pre_a_mean - pre_b_mean)
    val preDelta = (a.map(_._2).sum.toDouble / a.length -
      b.map(_._2).sum.toDouble / b.length) / 1e6
    val cuped = raw - theta * preDelta
    assert(math.abs(row.getDouble(row.fieldIndex("cuped_delta")) - cuped) < 1e-4)
  }

  test("profile_subgroups: z consistent with cell means; weighted deviations balance") {
    val rows = SparkEntry.queries("profile_subgroups")(spark, sf).collect()
    assert(rows.nonEmpty)
    // n-weighted cell means average back to the global mean, so the
    // n-weighted (cell - global) deviations must sum to ~0
    val totalN = rows.map(_.getLong(2)).sum.toDouble
    val gmean = rows.map(r => r.getDouble(3) * r.getLong(2)).sum / totalN
    val weighted = rows.map(r => (r.getDouble(3) - gmean) * r.getLong(2)).sum
    assert(math.abs(weighted) < 1e-2, s"weighted deviations $weighted")
    // z sign agrees with the deviation sign
    rows.foreach { r =>
      val dev = r.getDouble(3) - gmean
      if (math.abs(dev) > 1e-6)
        assert(r.getDouble(4).sign === dev.sign, s"${r.getString(0)}/${r.getString(1)}")
    }
  }
}
