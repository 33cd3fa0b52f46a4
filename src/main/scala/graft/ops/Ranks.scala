package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking WITHOUT a single-partition window.
  *
  * `Window.partitionBy(group).orderBy(...)` hash-partitions by the group
  * key, so one giant group (one language of a web corpus, one tenant,
  * one hot day) lands in ONE task no matter how many executors exist —
  * the classic scale cliff of per-group ranks. This utility computes the
  * same ranks by the two-phase scheme every distributed sort uses:
  *
  *   1. `repartitionByRange` over the FULL order key (group columns
  *      first) — boundaries come from sampling, so partitions are
  *      balanced regardless of group skew, and a group larger than a
  *      partition simply spans several;
  *   2. (partition × group) row counts — ONE model-sized collect from
  *      which every per-group prefix offset and group total derives
  *      driver-side (range partitioning guarantees a group's rows in
  *      lower partitions sort wholly earlier);
  *   3. local per-group row_number within each range partition (each
  *      partition one balanced task) + that partition's per-group
  *      offset, attached by a broadcast join = the per-group rank.
  *
  * The order key must be a TOTAL order (include a tiebreaker column) —
  * that is what makes the result independent of where the sampled range
  * boundaries fall. Verified byte-identical to the window form in
  * RanksSpec.
  */
object Ranks {

  /** Adds `rankCol` = 1-based rank within each group under `order`
    * (which must totally order rows within a group), plus `nCol` = the
    * group's total row count — the pair a closed-form ntile/percentile
    * needs. Shuffles the frame twice (range + pid-local window), never
    * creates a per-group task. */
  def perGroupRank(df: DataFrame, group: Seq[String], order: Seq[Column],
      rankCol: String, nCol: String, partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
    // one balanced task per range partition; localCheckpoint pins the
    // partitioning so the count job and the rank job see identical pids
    // (and the range shuffle runs once)
    val pinned = ranged.localCheckpoint()
    // ONE model-sized collect — (partition × group) counts, from which
    // every offset and every group total derives driver-side
    val keyCols = col("__pid") +: group.map(col)
    val counts = pinned.groupBy(keyCols: _*).agg(count(lit(1)).as("__c"))
      .collect()
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = counts.groupBy(keyOf)
    val nByGroup = byGroup.map { case (k, rs) =>
      k -> rs.map(_.getLong(rs.head.length - 1)).sum }
    // rows preceding (pid, group) within its group = counts of the same
    // group in lower pids (range partitioning puts them wholly earlier)
    val offRows = counts.map { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val off = byGroup(k).filter(_.getInt(0) < pid)
        .map(_.getLong(r.length - 1)).sum
      Row.fromSeq(r.toSeq.init ++ Seq(off, nByGroup(k)))
    }
    val offSchema = StructType(
      pinned.select(keyCols: _*).schema.fields :+
        StructField("__off", LongType, nullable = false) :+
        StructField(nCol, LongType, nullable = false))
    val offDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    // local per-group rank inside the (balanced) range partition + the
    // partition's per-group prefix offset = the per-group rank
    val local = row_number().over(
      Window.partitionBy(keyCols: _*).orderBy(order: _*))
    pinned
      .withColumn("__local", local)
      .join(broadcast(offDf), "__pid" +: group)
      .withColumn(rankCol, col("__off") + col("__local"))
      .drop("__pid", "__local", "__off")
  }

  /** Closed-form ntile over a (rank, n) pair — the arithmetic twin of
    * `ntile(k) OVER (PARTITION BY group ORDER BY ...)`: the first
    * n mod k buckets take ceil(n/k) rows, the rest floor(n/k). */
  def ntileExpr(rank: Column, n: Column, k: Int): Column = {
    // Column./ is DOUBLE division even on integral inputs — floor it
    // back to the integral quotient (exact below 2^53 rows per group)
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val q = idiv(n, lit(k))    // floor bucket size
    val r = n % k              // buckets holding one extra row
    val cut = r * (q + 1L)     // rows covered by the bigger buckets
    when(rank <= cut, idiv(rank - 1L, q + 1L) + 1L)
      .otherwise(r + idiv(rank - cut - 1L, greatest(q, lit(1L))) + 1L)
      .cast("int")
  }
}
