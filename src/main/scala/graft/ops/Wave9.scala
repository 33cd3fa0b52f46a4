package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.Tables

/** Round-6 second wave: lakehouse merge-on-read + retrieval.
  *
  * - `sink_delete_dv`: DELETE via deletion vectors (Delta DV / Iceberg
  *   v2 position deletes) — the delete writes kilobytes, never rewrites
  *   a data file; reads anti-join the dead-position set.
  * - `search_inverted` / `search_phrase`: the inverted-index retrieval
  *   pair over the documents corpus — conjunctive (AND) term search on
  *   a term-clustered posting-list index, and positional phrase search
  *   via adjacency self-join on the positional postings.
  *
  * Determinism: postings derive from the same tokenizer every text_*
  * oracle pins; counts/positions are integers end-to-end.
  */
object Wave9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Whitespace/punct token split — identical to LlmPipeline.tokens
    * (pinned by the text_* oracles). */
  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), x => x =!= "")
  private val duckToks =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x->x<>'')"

  // ---- sink_delete_dv: merge-on-read DELETE via deletion vectors -------

  /** DELETE as a deletion vector: two MOR deletes against a 4-file part
    * table — neither touches a data file (the query REQUIREs the v1 file
    * list survives both commits verbatim, so a silent fallback to
    * copy-on-write fails the gate, not just a spec) — then the read-back
    * aggregates the surviving rows per size band. At 100 TB this is the
    * only viable DELETE shape for scattered predicates: copy-on-write
    * rewrites every file that holds a match (here: all of them), while
    * the vector costs O(deleted rows) bytes and one broadcast anti-join
    * on read. OPTIMIZE later compacts the debt away
    * (VersionedStoreSpec pins that, plus resurrection-safety of the
    * upsert/delete rewrite paths, vacuum refcounting, CDF visibility,
    * clone linking, and the OCC union of concurrent vectors). */
  private val sinkDeleteDv: Q = (s, dir) => {
    val root = graft.engine.Fs.freshScratch(s, "dv")
    val store = new graft.engine.VersionedStore(root)
    val base = t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("int").as("p_size"),
        col("p_retailprice"))
    store.write(base.repartitionByRange(4, col("p_partkey")), "part") // v1
    store.deleteMor(s, "part", col("p_size") < 10)                    // v2
    store.deleteMor(s, "part", pmod(col("p_partkey"), lit(7)) === 0)  // v3
    val v1Files = store.manifestWithStats("part", 1L)._2.map(_.file)
    val v3 = store.manifestWithStats("part", 3L)._2
    require(v3.map(_.file) == v1Files,
      "sink_delete_dv: MOR delete must not rewrite data files")
    require(v3.forall(_.dvs.nonEmpty),
      "sink_delete_dv: every file held matches, every entry must carry a dv")
    store.read(s, "part")
      .groupBy(pmod(col("p_size"), lit(5)).as("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_partkey")).as("key_sum"),
        sum(col("p_retailprice").cast("decimal(18,2)")).cast("double")
          .as("price_sum"))
      .orderBy("band")
  }

  private val sinkDeleteDvOracle =
    """SELECT CAST(CAST(p_size AS INT) % 5 AS INT) AS band,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(p_partkey) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM part
      |WHERE NOT (CAST(p_size AS INT) < 10) AND NOT (p_partkey % 7 = 0)
      |GROUP BY 1 ORDER BY band""".stripMargin

  // ---- search_inverted / search_phrase: inverted-index retrieval -------

  /** Positional posting list of the corpus: one row per (term, doc_id,
    * pos), materialized range-clustered and sorted ON TERM — the layout
    * an inverted index lives on: a query for k terms reads only the
    * files/row groups whose term range covers them (manifest min/max +
    * parquet footer stats), never the corpus. Build cost: one scan +
    * one range shuffle of the exploded postings — the same cost law as
    * the index build of any search engine. */
  private def postingIndex(s: SparkSession, dir: String): DataFrame = {
    val root = graft.engine.Fs.freshScratch(s, "postings")
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "term")))
      .repartitionByRange(8, col("term"))
      .sortWithinPartitions("term", "doc_id", "pos")
      .write.mode("overwrite").parquet(root)
    s.read.parquet(root)
  }

  /** Conjunctive (AND) term search over the inverted index: documents
    * containing ALL of {hash, join, vector}, with each term's frequency.
    * The term predicate is PUSHED to the index scan (In(term, ...) over
    * the term-sorted files — row-group skipping does the candidate
    * selection), then ONE doc-keyed aggregation intersects the posting
    * lists: conditional tf sums + a distinct-term count, HAVING = k.
    * At 100 TB of corpus the query's shuffle is the matched postings of
    * three terms, never the index. */
  private val searchInverted: Q = (s, dir) => {
    val terms = Seq("hash", "join", "vector")
    val idx = postingIndex(s, dir).filter(col("term").isin(terms: _*))
    idx.groupBy("doc_id")
      .agg(
        sum(when(col("term") === "hash", 1L).otherwise(0L)).as("n_hash"),
        sum(when(col("term") === "join", 1L).otherwise(0L)).as("n_join"),
        sum(when(col("term") === "vector", 1L).otherwise(0L)).as("n_vector"),
        countDistinct("term").as("__k"))
      .filter(col("__k") === terms.size)
      .drop("__k")
      .orderBy("doc_id")
  }

  private val searchInvertedOracle =
    s"""WITH p AS (
       |  SELECT doc_id, unnest($duckToks) AS term FROM documents)
       |SELECT doc_id,
       |  CAST(SUM(CASE WHEN term='hash' THEN 1 ELSE 0 END) AS BIGINT) AS n_hash,
       |  CAST(SUM(CASE WHEN term='join' THEN 1 ELSE 0 END) AS BIGINT) AS n_join,
       |  CAST(SUM(CASE WHEN term='vector' THEN 1 ELSE 0 END) AS BIGINT) AS n_vector
       |FROM p WHERE term IN ('hash','join','vector')
       |GROUP BY doc_id
       |HAVING COUNT(DISTINCT term) = 3
       |ORDER BY doc_id""".stripMargin

  /** Positional phrase search ("hash join", adjacent tokens) over the
    * SAME positional index: the classic posting-intersection-with-
    * offsets — each phrase term's postings are pulled by a pushed term
    * filter, then a (doc_id, pos+1 = pos) equi-join aligns adjacency.
    * The join's inputs are two single-term posting lists (selective by
    * construction); Spark broadcasts the smaller. This is the index-
    * resident form: at query time only the index exists, not the text
    * — the array-zip form over raw documents is the oracle. */
  private val searchPhrase: Q = (s, dir) => {
    val idx = postingIndex(s, dir)
    val a = idx.filter(col("term") === "hash")
      .select(col("doc_id"), col("pos"))
    val b = idx.filter(col("term") === "join")
      .select(col("doc_id").as("doc_id_b"), col("pos").as("pos_b"))
    a.join(b, col("doc_id") === col("doc_id_b") &&
        col("pos_b") === col("pos") + lit(1))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"), min("pos").as("first_pos"))
      .orderBy("doc_id")
  }

  private val searchPhraseOracle =
    s"""WITH p AS (
       |  SELECT doc_id, unnest(t) AS term,
       |         generate_subscripts(t, 1) - 1 AS pos
       |  FROM (SELECT doc_id, $duckToks AS t FROM documents)),
       |a AS (SELECT doc_id, pos FROM p WHERE term = 'hash'),
       |b AS (SELECT doc_id, pos FROM p WHERE term = 'join')
       |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
       |  CAST(MIN(a.pos) AS INT) AS first_pos
       |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "sink_delete_dv" -> sinkDeleteDv,
    "search_inverted" -> searchInverted,
    "search_phrase" -> searchPhrase
  )

  val oracles: Map[String, String] = Map(
    "sink_delete_dv" -> sinkDeleteDvOracle,
    "search_inverted" -> searchInvertedOracle,
    "search_phrase" -> searchPhraseOracle
  )
}
