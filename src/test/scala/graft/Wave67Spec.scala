package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-67 semantics: Wilson bounds replay from a local closed form
  * and bracket p̂; BH is never more conservative than Holm and its
  * adjustment replays locally. */
class Wave67Spec extends SparkSuite {

  test("events_wilson_ci: local closed-form replay, interval brackets p-hat") {
    val rows = SparkEntry.queries("events_wilson_ci")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ua = Tables.load(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = ua.map(_._2).distinct.length.toLong
    val z = 1.959963984540054
    rows.foreach { r =>
      val k = ua.count(_._1 == r.getString(0)).toLong
      assert(r.getLong(1) === k && r.getLong(2) === n)
      val ph = k.toDouble / n
      val z2n = z * z / n
      val center = (ph + z2n / 2.0) / (z2n + 1.0)
      val hw = z / (z2n + 1.0) * math.sqrt(ph * (1.0 - ph) / n + z2n / (n * 4.0))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - r6(center - hw)) < 1e-9)
      assert(math.abs(r.getDouble(5) - r6(center + hw)) < 1e-9)
      // interval is inside [0,1] and brackets p-hat
      assert(r.getDouble(4) >= -1e-9 && r.getDouble(5) <= 1.0 + 1e-9)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9 &&
        r.getDouble(3) <= r.getDouble(5) + 1e-9)
    }
  }

  test("events_bh_fdr: BH is no more conservative than Holm; step-up replay") {
    val bh = SparkEntry.queries("events_bh_fdr")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("p")), r.getDouble(r.fieldIndex("p_bh")),
          r.getBoolean(r.fieldIndex("discovery")))).toMap
    val holm = SparkEntry.queries("events_holm")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("p_holm"))).toMap
    assert(bh.keySet === holm.keySet)
    bh.foreach { case (et, (_, pbh, _)) =>
      assert(pbh <= holm(et) + 1e-9, s"$et: BH above Holm")
    }
    // local step-up replay from the reported raw p-values
    val ordered = bh.toSeq.sortBy { case (et, (p, _, _)) => (p, et) }
    val m = ordered.length.toDouble
    var runMin = Double.MaxValue
    val expect = ordered.zipWithIndex.reverse.map { case ((et, (p, _, _)), i) =>
      runMin = math.min(runMin, m * p / (i + 1))
      et -> math.min(1.0, runMin)
    }.toMap
    bh.foreach { case (et, (_, pbh, disc)) =>
      assert(math.abs(pbh - BigDecimal(expect(et))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 5e-6, s"$et p_bh")
      assert(disc === (pbh <= 0.10))
    }
  }
}
