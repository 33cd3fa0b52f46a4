package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.Q
import graft.engine.{Fs, Tables}

/** Physical-layout operators: the storage-side join accelerations a
  * 100 TB deployment lives on — bucketed co-located joins (pre-shuffle
  * the fact ONCE at write time, then every key join runs exchange-free)
  * and dynamic partition pruning (a selective dim filter prunes the
  * fact's partition directories at runtime, so the scan never reads
  * excluded partitions). Both are registered queries whose RESULTS are
  * differential-gate-checked; their plan contracts (no Exchange under
  * the bucketed join; a dynamicpruning PartitionFilter on the fact
  * scan) are pinned by PhysicalPlanSpec.
  *
  * The reference stores everything as unbucketed managed tables
  * (ref: dbc cmd8/9 `create or replace table ... using delta`) and
  * relies on Databricks OPTIMIZE for layout; bucketing/DPP are the
  * open-Spark layout knobs this engine adds (SURVEY §4.1 layout
  * maintenance, §2.3 join family).
  */
object Physical {

  /** Write (fact, dim) as 8-bucket tables keyed on the join column and
    * return them registered in the session catalog. Bucket files land
    * under a per-run scratch root (external tables — nothing touches
    * the default warehouse dir). repartition on the key first: Spark's
    * bucket assignment IS HashPartitioning, so each task holds whole
    * buckets and writes exactly one file per bucket — which keeps the
    * bucketed SORT metadata usable (multi-file buckets force a re-sort
    * at read time). */
  private[graft] def writeBucketed(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val root = Fs.freshScratch(s, "bucketed")
    val fact = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val dim = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    fact.repartition(8, col("l_orderkey"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$root/fact").saveAsTable("graft_bucket_fact")
    dim.repartition(8, col("o_orderkey"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$root/dim").saveAsTable("graft_bucket_dim")
    (s.table("graft_bucket_fact"), s.table("graft_bucket_dim"))
  }

  /** Exchange-free equi-join on co-bucketed tables: both sides were
    * hash-clustered into the same 8 buckets on the join key at WRITE
    * time, so the join consumes the stored clustering instead of
    * shuffling either side — at 100 TB this converts every recurring
    * fact-dim key join from a full two-sided exchange into a local
    * merge. The merge hint keeps the broadcast planner from hiding the
    * property being exercised. */
  private[graft] def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (fact, dim) = writeBucketed(s, dir)
    fact.hint("merge")
      .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
  }

  private val joinBucketed: Q = (s, dir) =>
    bucketedJoin(s, dir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")

  private val joinBucketedOracle =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** The event-type -> reporting-tier dim a warehouse would join on;
    * declared inline (model-sized) in both engines. */
  private val tierRows = Seq(
    ("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
    ("signup", "acquisition"), ("error", "ops"))

  /** Dynamic partition pruning: the fact is stored partitioned by
    * event_type; joining it to the tier dim filtered to 'engagement'
    * injects a runtime IN-subquery partition filter on the fact scan
    * (reusing the dim's broadcast), so only the matching partition
    * directories are read — the open-Spark analog of the reference's
    * partition-pruned Delta reads, and the mechanism that keeps a
    * 100 TB date/type-partitioned fact from being full-scanned by
    * every selective dim join. */
  private[graft] def dppJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = Fs.freshScratch(s, "dpp")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(s"$root/ev")
    val fact = s.read.parquet(s"$root/ev")
    // the dim must be a real relation (not an inline LocalRelation — the
    // optimizer folds the filter into local data and the pruning rule
    // then sees no selective predicate to derive a runtime filter from)
    tierRows.toDF("event_type", "tier")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/tiers")
    val dim = s.read.parquet(s"$root/tiers")
    fact.join(broadcast(dim.filter(col("tier") === "engagement")), Seq("event_type"))
  }

  private val joinDppPrune: Q = (s, dir) =>
    dppJoin(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .orderBy("event_type")

  private val joinDppPruneOracle = {
    val values = tierRows.map { case (t, tr) => s"('$t','$tr')" }.mkString(", ")
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
       |FROM events JOIN (VALUES $values) AS t(event_type, tier) USING (event_type)
       |WHERE tier = 'engagement'
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "join_bucketed" -> joinBucketed,
    "join_dpp_prune" -> joinDppPrune
  )

  val oracles: Map[String, String] = Map(
    "join_bucketed" -> joinBucketedOracle,
    "join_dpp_prune" -> joinDppPruneOracle
  )
}
