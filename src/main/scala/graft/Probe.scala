package graft

/** Throwaway dev tool: dumps `explain("formatted")` for representative
  * queries into PLANS.md (plan-quality evidence: pushdowns, broadcast
  * choices, partial aggregation, codegen spans). Not part of the
  * library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.local("graft-plans")
    val interesting = Seq(
      "flagship_star_join" -> "star join: broadcast dims, shuffle on the fact key, top-10",
      "profile_histogram" -> "whole-database histogram (reads the materialized aggregate)",
      "filter_eq_lookup" -> "predicate pushdown + column pruning at the scan",
      "sim_knn_join" -> "broadcast query set + two-phase per-query top-k",
      "sim_ann_lsh" -> "LSH candidates: fused narrow bucket projection (no exchange before the bucket join)",
      "sim_pq" -> "PQ ADC: m array-literal lookups per row over the codes table, exact rerank of top candidates only",
      "corpus_mix" -> "weighted mixture sampling: broadcast model-sized totals, one per-source window",
      "join_range_banded" -> "banded range join, interior/edge decomposed: broadcast per-band counts for covered bands, pair-level check only at the 2 edges",
      "decontaminate" -> "train/eval shingle overlap: one shingle equi-join + anti join, eval side distinct'ed",
      "semdedup" -> "cluster-blocked semantic dedup: narrow-map cell argmax, within-cell pair join only",
      "events_funnel" -> "3-stage funnel: one user_id exchange reused by all Window layers + distinct, no time-order sort",
      "win_topk_per_group" -> "native bounded top-k aggregate (no window sort)",
      "agg_salted_skew" -> "two-phase salted aggregation",
      "join_salted_skew" -> "16-way salted hot-key join",
      "corpus_curriculum" -> "two-phase distributed per-group rank: range partition + ONE (partition x group) counts collect + broadcast offsets — no single-language window task",
      "agg_hll_mergeable" -> "mergeable-sketch rollup: both aggregations shuffle sketch-sized state, exact twin joined for the bound check",
      "profile_corr_matrix" -> "all-pairs correlation in ONE pass: 25 long adders (hi/lo split product sums), corr derived on the 1-row aggregate",
      "profile_equidepth" -> "equi-depth histogram over the distributed total-order rank (range partition + broadcast offsets, no single window task)",
      "text_textrank" -> "8 PageRank supersteps as nested broadcast joins over the vocabulary-sized rank vector (exchange reuse, no checkpoints)",
      "source_partitioned" -> "partition pruning at planning time",
      "dedup_embed_cosine" -> "embedding dedup blocked on (label, sign-LSH cell): candidate equi-join keyed by the bucket — never label-only all-pairs (r6)",
      "sample_balanced" -> "balanced downsample: min-class count inlined from the rank kernel's driver-side offsets — no SinglePartition exchange anywhere (r6)",
      "text_rarity" -> "global vocabulary rank via the two-phase range-partition kernel, empty group — no vocabulary-sized window task (r6)",
      "vocab_build" -> "global top-k vocabulary: TakeOrderedAndProject, id window bounded by the literal k=256 (r6)",
      "tokenize_bpe" -> "BPE encode: 8 chained merge rewrites over DISTINCT tokens (vocabulary-sized), broadcast back onto the corpus stream (r6)",
      "dedup_substring" -> "sliding-shingle substring dedup: hash-keyed duplicate count + doc_id-keyed windowed interval union — no global window (r6)",
      "quality_classifier" -> "Naive Bayes distillation: training is ONE aggregation (model-sized shuffle state), model re-joined broadcast for scoring (r6)",
      "corpus_dsir" -> "DSIR importance resampling: vocab-sized LM count tables + scalar totals broadcast, narrow accept map (r6)",
      "text_bigram_lp" -> "bigram LM: pairs from a pure narrow array map (no window), tfidf-class linear shape (r6)",
      "pipeline_e2e" -> "end-to-end curation funnel: gate joins + md5-keyed dedup agg + budget sheet, digest-width shuffle keys (r6)",
      "profile_ks" -> "exact two-sample KS: packed (n1,n2) word through ONE two-phase prefix-sum pass, int64 numerator (r6)",
      "join_skew_aqe" -> "AQE skew-join split of the hot partition (skew=true), dim materialized so the rule pattern matches (r6)",
      "eval_ann" -> "ANN recall/nDCG evaluator: broadcast query set, bucket-candidate cosine only, inlined-literal discounts (r6)",
      "join_asof_tolerance" -> "merge_asof with max-lookback tolerance: the band predicate bounds as-of join fan-out (r6)",
      "corpus_interleave" -> "round-robin multi-source training order: two-phase per-source rank + broadcast source index, no global sort (r6)",
      "profile_outliers" -> "Tukey IQR fences: model-sized quartile aggregate broadcast back, one conditional-count pass (r6)",
      "flagship_snowflake_join" -> "TPC-H Q5 shape: date range pushed to the orders scan, multi-hop broadcast dims, partial agg under the exchange (r6)",
      "join_bucketed" -> "co-bucketed join: zero exchanges — the write-time clustering is the shuffle (r6)",
      "join_dpp_prune" -> "dynamic partition pruning: runtime dynamicpruning PartitionFilter on the fact scan from the dim's broadcast (r6)",
      "corpus_temperature" -> "temperature source mixing: two source-keyed aggregations + broadcast rate table, no window (r6)",
      "text_zipf" -> "Zipf fit: ungrouped two-phase rank (balanced range shuffle, pid-local windows) + one scalar aggregate (r6)",
      "pipeline_funnel" -> "gate-survival funnel: corpus_filter's plan + one source-keyed conditional-sum aggregation (r6)",
      "search_inverted" -> "inverted-index AND query: pushed In(term) probe of the term-sorted posting files + ONE doc-keyed aggregation (r6)",
      "search_phrase" -> "positional phrase search: two single-term posting pulls (pushed EqualTo) joined on (doc, pos+1) adjacency (r6)",
      "sink_delete_dv" -> "deletion-vector read: data scan left-anti joined to the broadcast dead-position vector — no rewritten files (r6)",
      "graph_reachability" -> "recursive CTE BFS (UnionLoop): frontier x broadcast-edges per superstep, keyed lead window builds the edge list (r6)",
      "profile_kanonymity" -> "k-anonymity/l-diversity: one data-sized keyed pass, second aggregate on the model-sized class table (r6)",
      "profile_hotkeys" -> "hot-key profile: key-count aggregation + broadcast scalars + TakeOrderedAndProject (r6)",
      "events_pattern" -> "strict-adjacency sequence match: two user-keyed lags + predicate, one aggregation (r6)",
      "profile_benford" -> "Benford first-digit audit: narrow digit map + (type, digit) aggregation, statistic on the model-sized digit table (r6)",
      "split_leakage" -> "train/test leakage audit: two fingerprint-keyed corpus passes, leak table duplicate-cluster-sized (r6)",
      "timeseries_forecast" -> "linear-trend forecast: one (type, day) aggregation, regression algebra on the model-sized daily table (r6)",
      "sim_ann_lsh_md5" -> "md5-plane LSH ANN: literal-plane sign buckets, broadcast (table,bucket) candidate join, exact rerank (r6)",
      "skyline_pareto" -> "2-D skyline without the quadratic dominance join: per-size min aggregate + tiny broadcast theta-join + narrow frontier filter (r6w21)",
      "events_cusum" -> "CUSUM drift: prefix-sum kernel then the NEW prefix-MIN kernel (both pid-local), broadcast mean, exact micro units (r6w21)",
      "sample_weighted" -> "A-Res weighted sampling: narrow ln(u)/w key map + TakeOrderedAndProject — per-partition heaps, no global sort (r6w21)",
      "join_bloom" -> "explicit bloom-prefiltered join: literal 200KB filter probes the fact scan BEFORE the shuffle; exact join absorbs FPs (r6w22)",
      "graph_sssp" -> "weighted SSSP: 6 Bellman-Ford supersteps, frontier joins localCheckpoint'ed edges + min-agg per step (r6w22)",
      "rank_rrf" -> "hybrid RRF fusion: two bounded TakeOrderedAndProject channels, rank windows over <=50 literal rows, 50x50 outer fusion join (r6w23)",
      "sim_maxsim" -> "MaxSim late interaction: broadcast 4-vector query set, ONE corpus scan, max-per-(label,qvec) then decimal sum (r6w23)",
      "ewma_user" -> "exact EWMA: 20 lags sharing ONE window spec on the high-cardinality (user,type) key — single sort, integer num/den (r6w23)",
      "profile_gini" -> "Gini: two-phase rank kernel + DECIMAL(38,0) sums, one rounded division at the end (r6w24)",
      "sim_ann_filtered" -> "filtered ANN: label predicate at the scan (pre-filter), radius-1 multi-probe recovers recall, md5-plane hash-checked (r6w25)",
      "events_concurrency" -> "interval sweep: +1/-1 boundary deltas, global cumulative on the EMPTY-GROUP prefix-sum kernel, scalar output (r6w26)",
      "events_rfm" -> "RFM: three empty-group kernel ranks over the user frame + closed-form quintiles + cell histogram (r6w28)",
      "agg_bitmap_distinct" -> "bitmap exact distinct: BIT_OR chunk aggregation (map-side mergeable) + popcount sum — no per-distinct-row shuffle (r6w28)")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append("Generated by `graft.Probe` at sf0.001 (plan shape is scale-\n")
    sb.append("independent; AQE finalizes at runtime). Things to check per plan:\n")
    sb.append("PushedFilters/ReadSchema at scans, BroadcastHashJoin for dims,\n")
    sb.append("partial HashAggregate under Exchange, TakeOrderedAndProject for\n")
    sb.append("top-k, PartitionFilters for pruned sources.\n")
    for ((name, why) <- interesting) {
      val df = SparkEntry.queries(name)(spark, dir)
      // execute df's OWN QueryExecution: df.count() would build (and
      // AQE-finalize) a different count-aggregate plan, leaving THIS
      // plan's AdaptiveSparkPlan unfinalized in the dump
      df.collect()
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/PLANS.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("[plans] wrote PLANS.md")
    spark.stop()
  }
}
