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

  /** Hard ceiling on the (partition × group) offset table the two-phase
    * scheme collects to the driver. The kernel is for ranks over
    * DRIVER-BOUNDED group keys (language, source, label, model grain);
    * applied to a high-cardinality key the collect itself becomes the
    * scale cliff, so past this bound the kernel fails loudly instead of
    * silently ballooning the driver — use the plain window form (or
    * re-key) instead. */
  val MaxOffsetEntries: Int = 1 << 20

  /** Adds `rankCol` = 1-based rank within each group under `order`
    * (which must totally order rows within a group), plus `nCol` = the
    * group's total row count — the pair a closed-form ntile/percentile
    * needs. Shuffles the frame twice (range + pid-local window), never
    * creates a per-group task. */
  def perGroupRank(df: DataFrame, group: Seq[String], order: Seq[Column],
      rankCol: String, nCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame =
    twoPhase(df, group, order, lit(1L), rankCol, Some(nCol), partitions,
      maxOffsetEntries)._1

  /** [[perGroupRank]] plus the per-group row totals as a driver-side map
    * (group key values → count). The totals fall out of the
    * (partition × group) offset table the kernel ALREADY collects to
    * build the broadcast offsets — callers needing a group-cardinality
    * scalar (e.g. the min class count of a balanced sample) read it here
    * for free instead of planning an extra global aggregate. */
  def perGroupRankWithTotals(df: DataFrame, group: Seq[String],
      order: Seq[Column], rankCol: String, nCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): (DataFrame, Map[Seq[Any], Long]) =
    twoPhase(df, group, order, lit(1L), rankCol, Some(nCol), partitions,
      maxOffsetEntries)

  /** Adds `sumCol` = the inclusive running sum of `value` within each
    * group under `order` — `SUM(value) OVER (PARTITION BY group ORDER BY
    * order ROWS UNBOUNDED PRECEDING)` without the per-group window task.
    * `value` must be non-null integral (the driver-side prefix offsets
    * are exact long sums). */
  def perGroupPrefixSum(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, sumCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame =
    twoPhase(df, group, order, value, sumCol, None, partitions,
      maxOffsetEntries)._1

  /** Adds `minCol` = the inclusive running MINIMUM of `value` within
    * each group under `order` — `MIN(value) OVER (PARTITION BY group
    * ORDER BY order ROWS UNBOUNDED PRECEDING)` without the per-group
    * window task. Running min is associative, so the prefix-sum
    * two-phase scheme transfers verbatim: per-(partition, group) MINs
    * collect to the driver (model-sized), each partition's exclusive
    * prefix offset is the min of the same group's mins in lower range
    * partitions (identity = Long.MaxValue when none), and the result is
    * `least(offset, local running min)`. `value` must be non-null
    * integral. The kernel behind CUSUM drift (cum − prefix-min(cum))
    * and max-drawdown (prefix-max via negation). */
  def perGroupPrefixMin(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, minCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val pinned = ranged.localCheckpoint()
    val keyCols = col("__pid") +: group.map(col)
    val mins = pinned.groupBy(keyCols: _*).agg(min("__v").as("__m"))
      .limit(maxOffsetEntries + 1).collect()
    require(mins.length <= maxOffsetEntries,
      s"Ranks.perGroupPrefixMin: (partition x group) offset table exceeds " +
        s"$maxOffsetEntries entries - the group key ${group.mkString(",")} " +
        "is not driver-bounded; use a window form or coarser key")
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = mins.groupBy(keyOf)
    val offRows = mins.map { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val lower = byGroup(k).filter(_.getInt(0) < pid)
        .map(_.getLong(r.length - 1))
      val off = if (lower.isEmpty) Long.MaxValue else lower.min
      Row.fromSeq(r.toSeq.init :+ off)
    }
    val offSchema = StructType(
      pinned.select(keyCols: _*).schema.fields :+
        StructField("__off", LongType, nullable = false))
    val offDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val local = min(col("__v")).over(
      Window.partitionBy(keyCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val ogCols = group.indices.map(i => s"__og$i")
    val offAliased = offDf.toDF(("__opid" +: ogCols) :+ "__off": _*)
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__og$i") }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    pinned
      .withColumn("__local", local)
      .join(broadcast(offAliased), joinCond)
      .withColumn(minCol, least(col("__off"), col("__local")))
      .drop("__pid" +: "__v" +: "__local" +: "__off" +: "__opid" +: ogCols: _*)
  }

  /** Shared two-phase core: range-partition on (group, order), collect
    * the (partition × group) value sums — ONE model-sized collect, from
    * which every per-group prefix offset (and group total) derives
    * driver-side — then local windowing inside each balanced partition
    * plus a broadcast offset join. */
  private def twoPhase(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, outCol: String, totalCol: Option[String],
      partitions: Int, maxOffsetEntries: Int): (DataFrame, Map[Seq[Any], Long]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    // one balanced task per range partition; localCheckpoint pins the
    // partitioning so the sum job and the window job see identical pids
    // (and the range shuffle runs once)
    val pinned = ranged.localCheckpoint()
    val keyCols = col("__pid") +: group.map(col)
    // limit(max+1) bounds driver memory BEFORE the collect: a misapplied
    // high-cardinality key fails with a clear message, never an OOM
    val sums = pinned.groupBy(keyCols: _*).agg(sum("__v").as("__s"))
      .limit(maxOffsetEntries + 1).collect()
    require(sums.length <= maxOffsetEntries,
      s"Ranks.twoPhase: (partition x group) offset table exceeds " +
        s"$maxOffsetEntries entries - the group key ${group.mkString(",")} " +
        "is not driver-bounded; use a window form or coarser key")
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = sums.groupBy(keyOf)
    val totByGroup = byGroup.map { case (k, rs) =>
      k -> rs.map(_.getLong(rs.head.length - 1)).sum }
    // value preceding (pid, group) within its group = sums of the same
    // group in lower pids (range partitioning puts them wholly earlier)
    val offRows = sums.map { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val off = byGroup(k).filter(_.getInt(0) < pid)
        .map(_.getLong(r.length - 1)).sum
      Row.fromSeq(r.toSeq.init ++ (off +: totalCol.map(_ => totByGroup(k)).toSeq))
    }
    val offSchema = StructType(
      pinned.select(keyCols: _*).schema.fields ++
        (StructField("__off", LongType, nullable = false) +:
          totalCol.map(StructField(_, LongType, nullable = false)).toSeq))
    val offDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    // local per-group running sum inside the (balanced) range partition
    // + the partition's per-group prefix offset = the per-group value
    val local = sum(col("__v")).over(
      Window.partitionBy(keyCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // null-safe (<=>) offset join: Window.partitionBy and the driver-side
    // grouping both treat NULL as an ordinary group, so the join must
    // too — a plain USING join would silently drop NULL-keyed rows
    val ogCols = group.indices.map(i => s"__og$i")
    val offAliased = offDf.toDF(
      ("__opid" +: ogCols) ++ ("__off" +: totalCol.toSeq): _*)
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__og$i") }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    val out = pinned
      .withColumn("__local", local)
      .join(broadcast(offAliased), joinCond)
      .withColumn(outCol, col("__off") + col("__local"))
      .drop("__pid" +: "__v" +: "__local" +: "__off" +: "__opid" +: ogCols: _*)
    (out, totByGroup)
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

  /** Bounded per-group top-k, two-phase: local row_number inside each
    * physical partition prunes to ≤k rows per (partition, group) BEFORE
    * the global rank — ranking parallelism is cluster-width, not
    * #groups, and the global window only ever sees #partitions×k rows
    * per group. Adds `rn` (1-based BIGINT) and keeps rows with rn ≤ k.
    * `order` must totally order rows within a group (tie-break column
    * included) or the survivor set is nondeterministic. The shared core
    * behind sim_knn_join / sim_hard_negatives / embed_matryoshka. */
  def perGroupTopK(df: DataFrame, group: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val groupCols = group.map(col)
    val local = Window.partitionBy(col("__pid") +: groupCols: _*).orderBy(order: _*)
    val global = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(local)).filter(col("__lrn") <= k)
      .withColumn("rn", row_number().over(global).cast("bigint")).filter(col("rn") <= k)
      .drop("__pid", "__lrn")
  }
}
