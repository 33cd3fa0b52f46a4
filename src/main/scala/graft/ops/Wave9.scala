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

  val queries: Map[String, Q] = Map(
    "sink_delete_dv" -> sinkDeleteDv
  )

  val oracles: Map[String, String] = Map(
    "sink_delete_dv" -> sinkDeleteDvOracle
  )
}
