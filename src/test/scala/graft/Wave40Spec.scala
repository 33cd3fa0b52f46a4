package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-40 semantics: the backtest scores only second-half days and
  * its MAE reconciles with a local refit replay; target encoding is
  * exactly the leave-fold-out mean on every cell. */
class Wave40Spec extends SparkSuite {

  test("events_backtest: MAE matches a local rolling-refit replay") {
    val rows = SparkEntry.queries("events_backtest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
      .agg(sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
        .as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getString(0)
      val ys = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val n = ys.length
      assert(r.getLong(1) === n.toLong)
      val test = (1 to n).filter(t => t * 2 > n && t >= 3)
      assert(r.getLong(2) === test.length.toLong)
      val (errs, nerrs) = test.map { t =>
        val prior = (1 until t).map(i => (i.toLong, ys(i - 1)))
        val k = prior.length.toDouble
        val sx = prior.map(_._1).sum.toDouble
        val sy = prior.map(_._2).sum.toDouble
        val sxy = prior.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
        val sxx = prior.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
        val b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        val a = (sy - b * sx) / k
        val err = BigDecimal(math.abs(ys(t - 1).toDouble - (a + b * t)) / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        val nerr = BigDecimal(math.abs(ys(t - 1) - ys(t - 2)).toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (err, nerr)
      }.unzip
      val mae = (errs.sum / errs.length).toDouble
      val nmae = (nerrs.sum / nerrs.length).toDouble
      assert(math.abs(r.getDouble(3) - mae) < 1e-4, s"$et mae")
      assert(math.abs(r.getDouble(4) - nmae) < 1e-4, s"$et naive_mae")
      assert(math.abs(r.getDouble(5) - (1.0 - errs.sum.toDouble / nerrs.sum.toDouble)) < 1e-4)
    }
  }

  test("feat_target_encode: every cell is the exact leave-fold-out mean") {
    val rows = SparkEntry.queries("feat_target_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    def foldOf(uid: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((uid.toString + ":fe").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 5
    }
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect()
      .map(r => (r.getString(0), foldOf(r.getLong(1)), r.getLong(2)))
    rows.foreach { r =>
      val (et, fold) = (r.getString(0), r.getLong(1))
      val inFold = ev.filter(e => e._1 == et && e._2 == fold)
      val outFold = ev.filter(e => e._1 == et && e._2 != fold)
      assert(r.getLong(2) === inFold.length.toLong)
      val oof = outFold.map(e => BigInt(e._3)).sum.toDouble / outFold.length / 1e6
      assert(math.abs(r.getDouble(3) - oof) < 1e-4, s"$et/$fold")
      // leakage check by construction: removing the fold changes the mean
      // unless the fold is empty-complement (cannot happen with 5 folds here)
      assert(outFold.nonEmpty)
    }
  }
}
