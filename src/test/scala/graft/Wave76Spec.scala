package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-76 semantics: the logistic fit replays step-for-step from a
  * local Newton loop; PPR replays from a local integer power
  * iteration and conserves mass up to rounding slack. */
class Wave76Spec extends SparkSuite {

  test("ml_logreg_newton: local 6-step Newton replay; gate beats majority") {
    val row = SparkEntry.queries("ml_logreg_newton")(spark, sf).head
    val stop = Set("the", "and", "of", "to", "in", "is", "a", "that")
    val docs = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect().map { r =>
        val tk = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val hits = tk.distinct.count(stop.contains).toLong
        val y = if (r.getString(0) == "en") 1L else 0L
        val xm = (2 * 1000 * hits + tk.length) / (2 * tk.length)
        (y, xm)
      }
    var b0m = BigInt(0); var b1m = BigInt(0)
    for (_ <- 1 to 6) {
      var g0 = BigInt(0); var g1 = BigInt(0)
      var w00 = BigInt(0); var w01 = BigInt(0); var w11 = BigInt(0)
      docs.foreach { case (y, xm) =>
        val eta = (b0m * 1000 + b1m * xm).toDouble / 1e9
        val mu = 1.0 / (1.0 + math.exp(-eta))
        val gn = BigInt(math.round((y - mu) * 1e9))
        val wn = BigInt(math.round(mu * (1 - mu) * 1e9))
        g0 += gn; g1 += gn * xm
        w00 += wn; w01 += wn * xm; w11 += wn * xm * xm
      }
      val dd = w00 * w11 - w01 * w01
      def microSM(num: BigInt): BigInt =
        if (dd == 0) BigInt(0)
        else {
          val mag = (2 * num.abs * 1000000 + dd) / (2 * dd)
          if (num < 0) -mag else mag
        }
      b0m += microSM(w11 * g0 - w01 * g1)
      b1m += microSM((w00 * g1 - w01 * g0) * 1000)
    }
    assert(math.abs(row.getDouble(0) - b0m.toDouble / 1e6) < 1e-9, "b0")
    assert(math.abs(row.getDouble(1) - b1m.toDouble / 1e6) < 1e-9, "b1")
    val preds = docs.map { case (y, xm) =>
      (y, (b0m * 1000 + b1m * xm) > 0)
    }
    val tp = preds.count(p => p._2 && p._1 == 1).toLong
    val fp = preds.count(p => p._2 && p._1 == 0).toLong
    val tn = preds.count(p => !p._2 && p._1 == 0).toLong
    val fn = preds.count(p => !p._2 && p._1 == 1).toLong
    assert(row.getLong(2) === docs.length.toLong)
    assert((row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))
      === ((tp, fp, tn, fn)))
    val n = docs.length.toLong
    val majority = math.max(tp + fn, fp + tn).toDouble / n
    assert(row.getDouble(7) >= majority - 1e-9,
      "the trained gate is at least as good as always-majority")
  }

  test("graph_ppr: local integer power-iteration replay; mass conserved") {
    val out = SparkEntry.queries("graph_ppr")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getDouble(3)))).toMap
    val edges = ops.BrandGraph.edges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val seed = deg.toSeq.sortBy { case (x, d) => (-d, x) }.head._1
    var r = deg.map { case (x, _) => x -> BigInt(if (x == seed) 1000000000L else 0L) }
    for (_ <- 1 to 8) {
      val inflow = scala.collection.mutable.Map[String, BigInt]()
        .withDefaultValue(BigInt(0))
      adj.foreach { case (u, nbrs) =>
        val c = (2 * r(u) + deg(u)) / (2 * deg(u))
        nbrs.foreach(v => inflow(v) += c)
      }
      r = deg.map { case (x, _) =>
        x -> ((2 * 17 * inflow(x) + 20) / (2 * 20) +
          (if (x == seed) BigInt(150000000L) else BigInt(0)))
      }
    }
    assert(out.keySet === deg.keySet)
    out.foreach { case (x, (d, isSeed, ppr)) =>
      assert(d === deg(x))
      assert(isSeed === (x == seed))
      assert(math.abs(ppr - r(x).toDouble / 1e9) < 1e-9, s"ppr of $x")
    }
    // total mass stays near 1: teleport injects 0.15, damping removes 15%
    val mass = r.values.sum.toDouble / 1e9
    assert(mass > 0.5 && mass < 1.5, s"mass $mass")
    // the seed dominates its own personalized ranking
    assert(out(seed)._3 === out.values.map(_._3).max)
  }
}
