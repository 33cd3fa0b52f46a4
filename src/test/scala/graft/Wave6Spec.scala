package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Wave6

/** Wave-6 analytics operators: the semantic laws the DuckDB differential
  * gate cannot express — mass preservation under reshaping, agreement
  * with Spark's own estimators, window-form equivalence, graph-rank
  * invariants. */
class Wave6Spec extends SparkSuite {

  test("agg_pivot preserves event mass: wide row sums equal the long counts") {
    val wide = Wave6.queries("agg_pivot")(spark, sf)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wideTotal = wide
      .select(types.map(c => sum(col(c)).cast("long")).reduce(_ + _).as("t"))
      .collect()(0).getLong(0)
    val longTotal = graft.engine.Tables.load(spark, sf, "events").count()
    assert(wideTotal === longTotal)
    // no NULL cells survive the fill
    val anyNull = types.map(c => col(c).isNull).reduce(_ || _)
    assert(wide.filter(anyNull).count() === 0)
  }

  test("profile_corr_matrix agrees with Spark's builtin corr estimator") {
    val out = Wave6.queries("profile_corr_matrix")(spark, sf).collect()
    assert(out.length === 6) // C(4,2) pairs
    val li = graft.engine.Tables.load(spark, sf, "lineitem")
    out.foreach { r =>
      val (x, y, c) = (r.getString(0), r.getString(1), r.getDouble(3))
      assert(c >= -1.0 && c <= 1.0, s"corr($x,$y)=$c out of range")
      val builtin = li.agg(corr(col(x), col(y))).collect()(0).getDouble(0)
      assert(math.abs(c - builtin) < 1e-6, s"corr($x,$y): $c vs builtin $builtin")
    }
  }

  test("events_anomaly: z is NULL below 3 prior days and matches a direct computation") {
    val out = Wave6.queries("events_anomaly")(spark, sf).persist()
    // the first 3 rows of every type have <3 trailing observations
    val w = Window.partitionBy("event_type").orderBy("d")
    val early = out.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(early.filter(col("z").isNotNull).count() === 0)
    assert(early.filter(col("is_anomaly")).count() === 0)
    // recompute z directly for the 4th row of one type (3 prior days)
    val rows = out.filter(col("event_type") === "click").orderBy("d")
      .select("cnt", "z").collect()
    if (rows.length >= 4 && !rows(3).isNullAt(1)) {
      val prev = rows.slice(0, 3).map(_.getLong(0).toDouble)
      val n = prev.length.toDouble
      val mean = prev.sum / n
      val variance = (prev.map(x => x * x).sum - prev.sum * prev.sum / n) / (n - 1.0)
      val z = (rows(3).getLong(0).toDouble - mean) / math.sqrt(variance)
      assert(math.abs(rows(3).getDouble(1) - z) < 1e-5)
    }
    out.unpersist()
  }

  test("timeseries_resample equals the window row_number form, and OHLC bounds hold") {
    val out = Wave6.queries("timeseries_resample")(spark, sf).persist()
    assert(out.filter(col("low") > col("high")).count() === 0)
    assert(out.filter(col("open") > col("high") || col("open") < col("low")).count() === 0)
    assert(out.filter(col("close") > col("high") || col("close") < col("low")).count() === 0)
    // window-form twin: first/last value by (ts, event_id) per (type, day)
    val ev = graft.engine.Tables.load(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("ts"), col("event_id"), col("value"))
    val wa = Window.partitionBy("event_type", "d").orderBy(col("ts"), col("event_id"))
    val twin = ev
      .withColumn("o", first(col("value")).over(wa))
      .withColumn("c", last(col("value")).over(
        wa.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("event_type", "d")
      .agg(round(first(col("o")), 6).as("open2"), round(first(col("c")), 6).as("close2"))
    val joined = out.select("event_type", "d", "open", "close")
      .join(twin, Seq("event_type", "d"))
    assert(joined.count() === out.count())
    assert(joined.filter(col("open") =!= col("open2") || col("close") =!= col("close2"))
      .count() === 0)
    out.unpersist()
  }

  test("profile_equidepth: buckets are balanced, ordered, and cover every row") {
    val out = Wave6.queries("profile_equidepth")(spark, sf).persist()
    assert(out.count() === 10)
    val sizes = out.select("n_rows").collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    assert(sizes.sum === graft.engine.Tables.load(spark, sf, "lineitem").count())
    // boundaries are monotone: bucket k's hi <= bucket k+1's lo would be
    // too strict under ties — but lo <= hi within and lo is non-decreasing
    val rows = out.orderBy("bucket").select("lo", "hi").collect()
    rows.foreach(r => assert(r.getDouble(0) <= r.getDouble(1)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(0) <= b.getDouble(0) && a.getDouble(1) <= b.getDouble(1))
    case _ => }
    out.unpersist()
  }

  test("text_cooccur: apriori bound — a pair never outcounts either member's df") {
    val pairs = Wave6.queries("text_cooccur")(spark, sf).persist()
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val df = docs
      .select(col("doc_id"),
        explode(array_distinct(filter(split(lower(col("text")), "[^a-z0-9]+"),
          x => x =!= ""))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val checked = pairs
      .join(df.withColumnRenamed("token", "t1").withColumnRenamed("df", "df1"), "t1")
      .join(df.withColumnRenamed("token", "t2").withColumnRenamed("df", "df2"), "t2")
    assert(checked.count() === pairs.count())
    assert(checked.filter(col("n_docs_both") > least(col("df1"), col("df2")))
      .count() === 0)
    pairs.unpersist()
  }

  test("join_fuzzy: every variant verifies its edit distance and is not a dictionary hit of itself") {
    val out = Wave6.queries("join_fuzzy")(spark, sf).collect()
    assert(out.nonEmpty, "fixture vocabulary should contain distance<=2 variants")
    out.foreach { r =>
      val (d, v, dist) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(d != v)
      assert(dist >= 1 && dist <= 2)
      // driver-side Levenshtein re-verification
      val dp = Array.tabulate(d.length + 1, v.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to d.length; j <- 1 to v.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (d(i - 1) == v(j - 1)) 0 else 1))
      assert(dp(d.length)(v.length) === dist, s"distance($d,$v)")
    }
  }

  test("corpus_adaptive_filter keeps ~80% of each language (p20 threshold law)") {
    val out = Wave6.queries("corpus_adaptive_filter")(spark, sf).collect()
    out.foreach { r =>
      val (lang, total, kept) = (r.getString(0), r.getLong(2), r.getLong(3))
      // >= 80% minus the boundary row(s); <= 100%
      assert(kept <= total)
      assert(kept.toDouble / total >= 0.75, s"$lang kept $kept/$total")
      assert(kept.toDouble / total <= 0.90, s"$lang kept $kept/$total — threshold not binding")
    }
  }

  test("corpus_split covers every document exactly once, train dominating") {
    val out = Wave6.queries("corpus_split")(spark, sf).collect()
    val total = graft.engine.Tables.load(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum === total)
    val bySplit = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train").toDouble / total >= 0.9)
  }

  test("sample_balanced keeps exactly the min-class count per label — the smallest ids") {
    val out = Wave6.queries("sample_balanced")(spark, sf).persist()
    val kept = out.select("n_kept").collect().map(_.getLong(0)).distinct
    assert(kept.length === 1, s"unbalanced kept counts: ${kept.toSeq}")
    val emb = graft.engine.Tables.load(spark, sf, "embeddings")
    val minClass = emb.groupBy("label").count()
      .agg(min("count")).collect()(0).getLong(0)
    assert(kept.head === minClass)
    // window-form twin pins WHICH rows: same per-label id sums
    val w = Window.partitionBy("label").orderBy("vec_id")
    val twin = emb.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= minClass)
      .groupBy("label").agg(sum("vec_id").as("id_sum2"))
    val joined = out.join(twin, "label")
    assert(joined.filter(col("id_sum") =!= col("id_sum2")).count() === 0)
    out.unpersist()
  }

  test("sim_hard_negatives: never the query's own label, 3 per query, valid cosines") {
    val out = Wave6.queries("sim_hard_negatives")(spark, sf).persist()
    assert(out.filter(col("qlabel") === col("neg_label")).count() === 0)
    assert(out.filter(col("cos") < -1.000001 || col("cos") > 1.000001).count() === 0)
    val per = out.groupBy("qid").count().select("count").collect().map(_.getLong(0))
    assert(per.forall(_ === 3L))
    out.unpersist()
  }

  test("embed_matryoshka: overlap bounded by k and not degenerate") {
    val out = Wave6.queries("embed_matryoshka")(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getLong(2) === 3L)
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 3L)
    }
    // a quarter of the dimensions should preserve SOME retrieval signal
    assert(out.map(_.getLong(1)).sum > 0L)
  }

  test("join_asof_nearest dominates the backward as-of match in time distance") {
    val nearest = Wave6.queries("join_asof_nearest")(spark, sf).persist()
    // one row per event
    val nEvents = graft.engine.Tables.load(spark, sf, "events").count()
    assert(nearest.count() === nEvents)
    // nearest distance <= backward-only distance wherever backward matched
    val e = graft.engine.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
    val o = graft.engine.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val backward = e.join(o, col("user_id") === col("o_custkey") &&
        col("od") <= col("ed"), "left")
      .groupBy("event_id")
      .agg(min(abs(datediff(col("od"), col("ed")))).as("bdist"))
      .filter(col("bdist").isNotNull)
    val cmp = nearest.join(backward, "event_id")
    assert(cmp.filter(col("dist_days") > col("bdist")).count() === 0)
    nearest.unpersist()
  }

  test("profile_winsorized: mean inside the clip band, ~5% clipped each side") {
    val out = Wave6.queries("profile_winsorized")(spark, sf).collect()
    out.foreach { r =>
      val (n, p5, p95, m) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(m >= p5 - 1e-6 && m <= p95 + 1e-6)
      val (lo, hi) = (r.getLong(5), r.getLong(6))
      // exact percentile ⇒ clip fractions are ~5% (±1 row of interpolation)
      assert(math.abs(lo.toDouble / n - 0.05) < 0.02, s"clip_lo $lo/$n")
      assert(math.abs(hi.toDouble / n - 0.05) < 0.02, s"clip_hi $hi/$n")
    }
  }

  test("events_sessionize: contiguous session ids, non-negative durations, full coverage") {
    val out = Wave6.queries("events_sessionize")(spark, sf).persist()
    assert(out.filter(col("dur_sec") < 0).count() === 0)
    assert(out.filter(col("n_events") < 1).count() === 0)
    val ids = out.groupBy("user_id")
      .agg(min("sess").as("lo"), max("sess").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(ids.count() === 0)
    val covered = out.agg(sum("n_events")).collect()(0).getLong(0)
    val input = graft.engine.Tables.load(spark, sf, "events")
      .filter(col("user_id") < 200).count()
    assert(covered === input)
    out.unpersist()
  }

  test("text_keyphrases: PMI-ordered, distinct, bounded pairs") {
    val out = Wave6.queries("text_keyphrases")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 15)
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length === out.length)
    out.foreach(r => assert(r.getString(0) < r.getString(1)))
  }

  test("profile_psi: non-negative by construction, both halves populated") {
    val out = Wave6.queries("profile_psi")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // every PSI addend (p-q)·ln(p/q) is >= 0, so the sum must be
      assert(r.getDouble(1) >= 0.0, s"${r.getString(0)} psi ${r.getDouble(1)}")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 10)
    }
  }

  test("chunk_sentences preserves token mass, numbers chunks contiguously, bounds chunk size") {
    val out = Wave6.queries("chunk_sentences")(spark, sf).persist()
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val tokTotal = docs.select(
      sum(size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= "")))
        .cast("long")).collect()(0).getLong(0)
    assert(out.agg(sum("n_tok")).collect()(0).getLong(0) === tokTotal)
    // chunks are 0..k-1 per doc with no gaps
    val gaps = out.groupBy("doc_id")
      .agg(min("chunk").as("lo"), max("chunk").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(gaps.count() === 0)
    // a chunk never exceeds budget + wrap - 1 tokens (the floor-rule bound)
    assert(out.filter(col("n_tok") > 32 + 24 - 1).count() === 0)
    // wrapping engaged on this corpus: some doc has multiple chunks
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() > 0)
    out.unpersist()
  }

  test("text_textrank: ranks are a probability-like distribution concentrated on hub tokens") {
    val out = Wave6.queries("text_textrank")(spark, sf).persist()
    val scores = out.select("rank_score").collect().map(_.getDouble(0))
    assert(scores.forall(_ > 0))
    // PageRank mass conservation: full vector sums to ~1 (top-20 is a
    // subset, so bound from above; with a small vocab the top-20 IS most
    // of the graph)
    assert(scores.sum <= 1.0 + 1e-6)
    assert(scores.sum >= 0.5, s"top-20 mass ${scores.sum} — graph larger than expected")
    // hub tokens (highest degree×weight) outrank leaves: top score strictly
    // above the uniform initialization
    assert(scores.max > 1.0 / 60, s"max ${scores.max} not above uniform")
    out.unpersist()
  }
}
