package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkEntry.Q
import graft.engine.Tables

/** Byte-pair-encoding merge induction (Sennrich et al. 2016) — the
  * tokenizer-training step a corpus pipeline runs after vocab_build:
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair. Everything is expressed as DataFrame ops over the WORD
  * FREQUENCY DICTIONARY (vocabulary-sized, Heaps-bounded — the corpus
  * itself is touched exactly once, by the token count), zero UDFs:
  *
  *  - pair counting: each word's adjacent pairs, weighted by word
  *    frequency — all adjacent occurrences count (reference BPE
  *    semantics: "aaa" contributes (a,a) twice);
  *  - pair selection: total-ordered argmax (count DESC, left ASC,
  *    right ASC) — a one-row driver head() per round, model-sized like
  *    any trained artifact (Ivf centroids, Pq codebooks);
  *  - merge application: greedy leftmost rewrite per word as a pure
  *    array expression. Overlapping matches exist ONLY when
  *    left = right (a match at both i and i+1 forces s[i] = s[i+1] =
  *    s[i+2]); there the run-offset parity rule — merge where an even
  *    number of identical symbols trail position i — reproduces greedy
  *    exactly: a run of length L merges at offsets 0,2,4..., leaving a
  *    singleton iff L is odd.
  *
  * The oracle replays ALL rounds in DuckDB as a generated CTE chain
  * with the same parity rule, so the full training loop — not just one
  * step — is hash-checked. At 100 TB the dictionary aggregation is the
  * only corpus-sized job; rounds run on the head-K dictionary (same
  * TakeOrderedAndProject top-k shape as vocab_build).
  */
object Bpe {

  private val HeadWords = 200
  private val Rounds = 8

  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")
  private val duckToks =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x->x<>'')"

  /** Top-K word-frequency dictionary with each word's character symbol
    * array: the training input. Same scale shape as vocab_build —
    * per-partition k-head pruning, never a vocabulary-sized sort. */
  private def dictionary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(HeadWords)
      .select(col("token"), col("freq"),
        expr("transform(sequence(1, length(token)), i -> substr(token, i, 1))").as("syms"))

  /** All adjacent pairs of `syms` with their frequency-weighted counts
    * (syms[...] is 0-based in Spark SQL). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // greatest(...) + the in-lambda bound guard: sequence(0, -1) is a
      // DESCENDING sequence in Spark, so a single-symbol word would
      // otherwise index at -1 (ANSI error) instead of yielding no pairs
      .select(col("freq"), explode(expr(
        """filter(
          |  transform(sequence(0, greatest(size(syms) - 2, 0)), i ->
          |    CASE WHEN i <= size(syms) - 2
          |         THEN struct(get(syms, i) AS x, get(syms, i + 1) AS y) END),
          |  p -> p IS NOT NULL)""".stripMargin)).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("freq")).as("cnt"))

  private def sq(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Spark-side merge-start predicate at 0-based index `i` (a string
    * expression so the same template serves `i` and `i-1`). */
  private def startAt(i: String, x: String, y: String): String = {
    // get() (not syms[...]) everywhere: ANSI Spark raises on an
    // out-of-range index even when a preceding AND conjunct guards it;
    // get() returns NULL, the conjunction nulls out, CASE falls through
    val trailEq =
      s"(($i) - 1 - coalesce(aggregate(filter(sequence(0, greatest(($i) - 1, 0)), j -> j < ($i) AND get(syms, j) <> ${sq(x)}), -1, (a, j) -> greatest(a, j)), -1))"
    s"(($i) >= 0 AND ($i) < size(syms) - 1 AND get(syms, $i) = ${sq(x)} AND get(syms, ($i) + 1) = ${sq(y)}" +
      s" AND (${sq(x)} <> ${sq(y)} OR $trailEq % 2 = 0))"
  }

  /** Greedy leftmost merge of pair (x, y) inside `syms` as a pure array
    * expression: a starting element becomes the concatenated token, the
    * element after a start is dropped, everything else passes through. */
  private[graft] def mergeExpr(x: String, y: String): Column =
    expr(
      s"""filter(
         |  transform(sequence(0, size(syms) - 1), i ->
         |    CASE WHEN ${startAt("i", x, y)} THEN concat(${sq(x)}, ${sq(y)})
         |         WHEN ${startAt("i - 1", x, y)} THEN CAST(NULL AS STRING)
         |         ELSE get(syms, i) END),
         |  s -> s IS NOT NULL)""".stripMargin)

  /** Run [[Rounds]] merge rounds; returns (round, left, right,
    * weighted pair count) — the learned merge table. */
  private[graft] def learnedMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    var words = dictionary(s, dir).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to Rounds) {
      val best = pairCounts(words)
        .orderBy(desc("cnt"), asc("x"), asc("y")).limit(1).collect()
      if (best.nonEmpty) {
        val (x, y, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, x, y, c))
        // localCheckpoint truncates the per-round HOF lineage so round
        // R's plan does not re-derive rounds 1..R-1
        words = words.withColumn("syms", mergeExpr(x, y)).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** vocab_bpe: the merge table — (round, left, right, merged,
    * pair_count), the exact artifact a BPE tokenizer ships. */
  private val vocabBpe: Q = (s, dir) => {
    val rows = learnedMerges(s, dir).map { case (r, x, y, c) =>
      Row(r.toLong, x, y, x + y, c)
    }
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema).orderBy("round")
  }

  /** DuckDB-side merge-start predicate; DuckDB lists are 1-based, so
    * the 0-based template index is shifted at the access sites. `bx`/
    * `by` are SQL references to the round's argmax pair columns. */
  private def duckStartAt(i: String, bx: String, by: String): String = {
    val trailEq =
      s"(($i) - 1 - coalesce(list_max(list_filter(range(0, $i), j -> syms[CAST(j + 1 AS INT)] <> $bx)), -1))"
    s"(($i) >= 0 AND ($i) < len(syms) - 1 AND syms[CAST(($i) + 1 AS INT)] = $bx AND syms[CAST(($i) + 2 AS INT)] = $by" +
      s" AND ($bx <> $by OR $trailEq % 2 = 0))"
  }

  /** The oracle: w0 = the dictionary, then per round a (bN = argmax
    * pair, wN = rewritten words) CTE pair; the result unions the N
    * argmax rows — the same merge table the Spark loop learns. */
  private def oracleSql: String = {
    val dict =
      s"""w0 AS (
         |  SELECT token, freq,
         |    list_transform(range(1, length(token) + 1), i -> substr(token, CAST(i AS INT), 1)) AS syms
         |  FROM (SELECT token, CAST(count(*) AS BIGINT) AS freq
         |        FROM (SELECT unnest($duckToks) AS token FROM documents)
         |        GROUP BY token ORDER BY freq DESC, token LIMIT $HeadWords))""".stripMargin
    val stages = (1 to Rounds).map { r =>
      val p = r - 1
      val best =
        s"""b$r AS (
           |  SELECT syms[CAST(i + 1 AS INT)] AS x, syms[CAST(i + 2 AS INT)] AS y,
           |    CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, syms, unnest(range(len(syms) - 1)) AS i FROM w$p)
           |  GROUP BY 1, 2 ORDER BY cnt DESC, x, y LIMIT 1)""".stripMargin
      val rewrite =
        s"""w$r AS (
           |  SELECT token, freq,
           |    list_filter(
           |      list_transform(range(0, len(syms)), i ->
           |        CASE WHEN ${duckStartAt("i", s"b$r.x", s"b$r.y")} THEN concat(b$r.x, b$r.y)
           |             WHEN ${duckStartAt("i - 1", s"b$r.x", s"b$r.y")} THEN NULL
           |             ELSE syms[CAST(i + 1 AS INT)] END),
           |      s -> s IS NOT NULL) AS syms
           |  FROM w$p CROSS JOIN b$r)""".stripMargin
      best + ",\n" + rewrite
    }
    val union = (1 to Rounds)
      .map(r => s"""SELECT CAST($r AS BIGINT) AS round, x AS "left", y AS "right", concat(x, y) AS merged, cnt AS pair_count FROM b$r""")
      .mkString("\nUNION ALL\n")
    s"WITH $dict,\n${stages.mkString(",\n")}\n$union\nORDER BY round"
  }

  val queries: Map[String, Q] = Map("vocab_bpe" -> vocabBpe)
  val oracles: Map[String, String] = Map("vocab_bpe" -> oracleSql)
}
