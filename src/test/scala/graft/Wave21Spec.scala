package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranks

/** Wave-21 semantics: skyline non-domination, A-Res sampling bias,
  * TWAP interval accounting, CUSUM = max-subarray identity on the new
  * prefix-min kernel, bootstrap CI sanity — plus the kernel plan
  * contracts (pid-local windows only, no single-partition exchange on
  * the data path). */
class Wave21Spec extends SparkSuite {

  test("perGroupPrefixMin == the running-window form, including one dominant group") {
    import spark.implicits._
    val rows = (1L to 997L).map(i => ("en", i, ((i * 37) % 101) - 50L)) ++
      (1L to 12L).map(i => ("fr", 10000L + i, 7L - i))
    val df = rows.toDF("lang", "doc_id", "v")
    val two = Ranks.perGroupPrefixMin(df, Seq("lang"), Seq(col("doc_id")),
      col("v"), "pmin", partitions = 7)
    val win = df.withColumn("pmin_w", min("v").over(
      Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val diff = two.join(win, Seq("lang", "doc_id"))
      .filter(col("pmin") =!= col("pmin_w"))
    assert(diff.count() === 0)
    assert(two.count() === df.count())
  }

  test("skyline_pareto: every kept part is non-dominated, every frontier gap is dominated") {
    val out = SparkEntry.queries("skyline_pareto")(spark, sf)
    val rows = out.collect().map(r =>
      (r.getInt(r.fieldIndex("p_size")), r.getDouble(r.fieldIndex("p_retailprice"))))
    assert(rows.nonEmpty)
    // pairwise non-domination within the frontier itself
    for (a <- rows; b <- rows if a != b)
      assert(!(b._1 >= a._1 && b._2 <= a._2 && (b._1 > a._1 || b._2 < a._2)),
        s"$b dominates kept $a")
    // frontier prices strictly improve as size drops toward larger sizes
    val bySize = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = bySize.keys.toSeq.sorted.reverse
    sizes.sliding(2).foreach { case Seq(hi, lo) =>
      assert(bySize(lo) < bySize(hi), "frontier must strictly improve")
    case _ => () }
  }

  test("sample_weighted: long docs are overrepresented vs a uniform sample") {
    val docs = engine.Tables.load(spark, sf, "documents")
    val meanAll = docs.agg(avg("n_chars")).head.getDouble(0)
    val out = SparkEntry.queries("sample_weighted")(spark, sf)
    assert(out.count() === 100)
    val meanSample = out.agg(avg("n_chars")).head.getDouble(0)
    // length-proportional sampling drags the sampled mean above the
    // population mean (size-biased sampling inflates E[X] by 1+cv^2)
    assert(meanSample > meanAll,
      s"weighted sample mean $meanSample not above population mean $meanAll")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("events_twap: intervals = rows - types; kernel plan, no per-type window task") {
    val df = SparkEntry.queries("events_twap")(spark, sf)
    val rows = df.collect()
    val ev = engine.Tables.load(spark, sf, "events")
    val nRows = ev.count()
    assert(rows.map(_.getLong(1)).sum === nRows - rows.length)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("events_cusum: drift stats match a driver-side replay of the recurrence") {
    val out = SparkEntry.queries("events_cusum")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(r.fieldIndex("max_drift_micro")),
        r.getLong(r.fieldIndex("n_alarm")))).toMap
    val ev = engine.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"), col("ts"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    val H = 1000000000L
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val vs = rows.sortBy(r => (r._3.getTime, r._2)).map(_._4)
      val mu = vs.sum / vs.length // floor division, all positive
      var sAcc = 0L; var mx = 0L; var alarms = 0L
      vs.foreach { v =>
        sAcc = math.max(0L, sAcc + (v - mu))
        mx = math.max(mx, sAcc)
        if (sAcc > H) alarms += 1
      }
      assert(out(tpe) === ((mx, alarms)), s"type $tpe")
    }
  }

  test("events_cusum plan: fused sum+min kernel, no single-partition exchange") {
    val df = SparkEntry.queries("events_cusum")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the fused kernel computes the pid-local running sum AND its
    // running min inside the checkpoint job; the final plan reads the
    // pinned frame and attaches BOTH offsets with ONE broadcast join
    assert(plan.contains("__runmin") && plan.contains("__moff"), plan.take(1500))
    assert(plan.contains("Scan ExistingRDD"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("profile_bootstrap: sd tracks sigma/sqrt(n), ci_half = 1.96*sd") {
    val out = SparkEntry.queries("profile_bootstrap")(spark, sf).collect()
    assert(out.nonEmpty)
    val truth = engine.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(stddev_samp(col("value")).as("sd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    out.foreach { r =>
      val tpe = r.getString(0)
      val sdBoot = r.getDouble(r.fieldIndex("sd_boot"))
      val ciHalf = r.getDouble(r.fieldIndex("ci_half"))
      val (sd, n) = truth(tpe)
      val se = sd / math.sqrt(n.toDouble)
      assert(sdBoot > se * 0.5 && sdBoot < se * 2.0,
        s"$tpe: bootstrap sd $sdBoot far from analytic se $se")
      assert(math.abs(ciHalf - 1.96 * sdBoot) < 2e-3,
        s"$tpe: ci_half $ciHalf vs 1.96*sd ${1.96 * sdBoot}")
    }
  }

  test("mining_assoc: lift symmetry and confidence bounds") {
    val rows = SparkEntry.queries("mining_assoc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val conf = r.getDouble(r.fieldIndex("confidence"))
      val lift = r.getDouble(r.fieldIndex("lift"))
      assert(conf > 0 && conf <= 1)
      // lift is direction-symmetric; both directions are emitted
      val rev = byPair((b, a))
      assert(math.abs(lift - rev.getDouble(rev.fieldIndex("lift"))) < 1e-9)
    }
  }
}
