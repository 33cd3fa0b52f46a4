package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Institutional lint for the `ml_conformal_interval` bug class (round-8
  * verdict weak item #1): a window with no partition columns plans as a
  * SINGLE task holding its entire input — fine when the input is provably
  * k/model/vocab-bounded, a serialization cliff when it scales with the
  * data. Two complementary gates, each registry-backed so the audit can
  * never rot (a new site fails until justified; a stale entry fails when
  * its site disappears):
  *
  *  1. PLAN sweep — every declared query's OPTIMIZED plan is walked by
  *     [[WindowAudit.globalWindows]]; catches windows however they are
  *     spelled (API or SQL `over ()` text), but not windows a query
  *     materializes at build time (`localCheckpoint` inside the builder).
  *  2. SOURCE lint — every `Window.orderBy(...)` / empty or constant
  *     `Window.partitionBy(...)` call site in src/main; catches the
  *     build-time-materialized ones (e.g. text_generate_greedy's per-step
  *     argmax), but not SQL-text windows. Together they cover both axes.
  */
class WindowAuditSpec extends SparkSuite {

  // ---- gate 1: plan sweep over every declared query --------------------

  /** Query name -> why its partition-less window's input cannot be
    * data-scaled. Sites: see the file:line in each justification. */
  private val planRegistry: Map[String, String] = Map(
    "eval_ndcg" ->
      "rank over the limit(100) head (Wave45.scala:211-213)",
    "events_bh_fdr" ->
      "per-event-type p-value table: bounded type domain (Wave67.scala:116-118)",
    "events_holm" ->
      "per-event-type p-value table: bounded type domain (Wave44.scala:145-146)",
    "events_survival" ->
      "KM curve over DISTINCT durations: time-resolution-bounded domain, not row-scaled (Wave32.scala:46-47)",
    "ml_decision_stump" ->
      "one row per feature after the per-feature argmin (Wave74.scala:77-78)",
    "profile_spearman" ->
      "rank maps over the quantity/discount value-count tables: fixed TPC-H domains (~50/~11 values at any scale) (Wave56.scala boundedRanks)",
    "rank_rrf" ->
      "two limit(50) channel heads (Wave23.scala:36,46)",
    "sim_ann_lsh" ->
      "ANN recall gate: k=10 truth union candidate rows (LlmPipeline.scala:438)",
    "sim_ann_lsh_multiprobe" ->
      "ANN recall gate: k=10 truth union candidate rows (LlmPipeline.scala:438)",
    "sim_ivf" ->
      "ANN recall gate: k=10 truth union candidate rows (LlmPipeline.scala:438)",
    "sim_pq" ->
      "ANN recall gate: k=10 truth union candidate rows (LlmPipeline.scala:438)",
    "sketch_ams_f2" ->
      "8 AMS group sums (Wave74.scala:167-168)",
    "sketch_kmv_intersect" ->
      "merged KMV k-sets: <= 2k sketch rows (Wave49.scala:64-66)",
    "tokenize_ids" ->
      "vocab id assignment over the limit(256) head (Wave4.scala:350-352)",
    "tokenize_roundtrip" ->
      "vocab id assignment over the limit(256) head (Wave4.scala:350-352)",
    "vocab_build" ->
      "vocab id assignment over the limit(256) head (Wave4.scala:350-352)")

  test("plan sweep: every query's partition-less windows are registered") {
    val offenders = scala.collection.mutable.Map[String, Seq[String]]()
    for (n <- SparkEntry.queries.keys.toSeq.sorted) {
      val gw = WindowAudit.globalWindows(SparkEntry.queries(n)(spark, sf))
      if (gw.nonEmpty) offenders(n) = gw
    }
    val unregistered = offenders.keySet -- planRegistry.keySet
    assert(unregistered.isEmpty,
      "queries planning a partition-less window without a size justification " +
        "(single-task at scale - partition it, use the Ranks kernel, or " +
        "justify a bounded input here): " +
        unregistered.toSeq.sorted.map(n => s"$n :: ${offenders(n).mkString("|")}")
          .mkString("; "))
    val stale = planRegistry.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale planRegistry entries (site gone - remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("ml_conformal_interval plans no partition-less window (r8 fix)") {
    val gw = WindowAudit.globalWindows(
      SparkEntry.queries("ml_conformal_interval")(spark, sf))
    assert(gw.isEmpty, s"calibration rank must use the Ranks kernel, found: $gw")
  }

  // ---- gate 2: source lint over src/main -------------------------------

  private val srcRoot = new File("src/main/scala/graft")

  /** (relPath, form:normalizedArg) -> why that window's input cannot be
    * data-scaled. `form` is `orderBy` (global window API form) or
    * `partitionBy` (empty / constant partition spec). */
  private val sourceRegistry: Map[(String, String), String] = Map(
    ("ops/Wave32.scala", "orderBy:\"dur\"") ->
      "KM curve over DISTINCT durations: time-resolution-bounded domain",
    ("ops/Wave67.scala", "orderBy:\"p\", \"event_type\"") ->
      "per-event-type p-value table: bounded type domain",
    ("ops/Wave67.scala", "orderBy:desc(\"p\"), desc(\"event_type\")") ->
      "per-event-type p-value table: bounded type domain",
    ("ops/Wave67.scala", "partitionBy:lit(0)") ->
      "count over the per-event-type p-value table: bounded type domain",
    ("ops/Wave44.scala", "orderBy:\"p\", \"event_type\"") ->
      "per-event-type p-value table: bounded type domain",
    ("ops/Wave44.scala", "partitionBy:lit(0)") ->
      "count over the per-event-type p-value table: bounded type domain",
    ("ops/Wave23.scala", "orderBy:desc(\"bm25\"), asc(\"doc_id\")") ->
      "rank over the limit(50) lexical head",
    ("ops/Wave23.scala", "orderBy:desc(\"cos\"), asc(\"doc_id\")") ->
      "rank over the limit(50) dense head",
    ("ops/Wave4.scala", "orderBy:desc(\"freq\"), asc(\"token\")") ->
      "vocab id assignment over the limit(256) head",
    ("ops/Wave45.scala", "orderBy:desc(\"q\"), col(\"doc_id\")") ->
      "NDCG position over the limit(100) head",
    ("ops/Wave85.scala", "orderBy:desc(\"pn\"), asc(\"w2\")") ->
      "greedy-decode argmax over ONE token's bigram fanout (<= vocab); materialized per step",
    ("ops/Wave49.scala", "orderBy:\"h\"") ->
      "merged KMV k-sets: <= 2k sketch rows",
    ("ops/Wave56.scala", "orderBy:\"v\"") ->
      "rank maps over the quantity/discount value-count tables: fixed TPC-H domains",
    ("ops/Wave74.scala", "orderBy:\"g_micro\", \"feature\"") ->
      "one row per feature after the per-feature argmin",
    ("ops/Wave74.scala", "orderBy:\"gsum\", \"grp\"") ->
      "8 AMS group sums",
    ("ops/LlmPipeline.scala", "partitionBy:lit(0)") ->
      "ANN recall gate: k=10 truth union candidate rows")

  /** All global-window call sites as (relPath, form:normalizedArg):
    * `Window.orderBy(...)` (no partition), `Window.partitionBy()` and
    * `Window.partitionBy(lit(...), ...)` (constant spec). Paren-balanced
    * multiline extraction; comments skipped. */
  private def sites(): Seq[(String, String)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty
    walk(srcRoot).flatMap { f =>
      val rel = f.getPath.replace("src/main/scala/graft/", "")
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
      val lines = text.split("\n", -1)
      val starts = lines.scanLeft(0)(_ + _.length + 1)
      def lineAt(off: Int): String = {
        val i = starts.tail.indexWhere(_ > off)
        lines(if (i == -1) lines.length - 1 else i)
      }
      val pat = java.util.regex.Pattern.compile(
        "Window\\.(orderBy|partitionBy)\\(")
      val m = pat.matcher(text)
      val out = scala.collection.mutable.Buffer[(String, String)]()
      while (m.find()) {
        val ls = lineAt(m.start()).trim
        val isComment = ls.startsWith("*") || ls.startsWith("//") ||
          ls.startsWith("/**")
        if (!isComment) {
          var depth = 1; var j = m.end()
          while (j < text.length && depth > 0) {
            if (text.charAt(j) == '(') depth += 1
            else if (text.charAt(j) == ')') depth -= 1
            j += 1
          }
          val arg = text.substring(m.end(), j - 1).split("\\s+").mkString(" ").trim
          val form = m.group(1)
          val global = form == "orderBy" ||
            (form == "partitionBy" && (arg.isEmpty || arg.startsWith("lit(")))
          if (global) out += ((rel, s"$form:$arg"))
        }
      }
      out.toSeq
    }
  }

  test("source lint: every global-window call site is registered") {
    val found = sites().toSet
    val unregistered = found -- sourceRegistry.keySet
    assert(unregistered.isEmpty,
      "unjustified global-window call sites (single-task at scale - " +
        "partition it, use the Ranks kernel, or justify a bounded input " +
        s"in sourceRegistry): ${unregistered.toSeq.sorted.mkString("; ")}")
    val stale = sourceRegistry.keySet -- found
    assert(stale.isEmpty,
      s"stale sourceRegistry entries (site gone - remove them): " +
        stale.toSeq.sorted.mkString("; "))
  }
}
