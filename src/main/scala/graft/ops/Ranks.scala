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

  /** [[perGroupPrefixSum]] and [[perGroupPrefixMin]]-of-that-sum FUSED
    * into ONE kernel pass: adds `sumCol` = the inclusive running sum of
    * `value` within each group under `order`, and `minCol` = the
    * inclusive running MINIMUM of that running sum — the CUSUM pair
    * (S_i = cum_i − min(0, prefix-min(cum_i))). The r9 form ran the two
    * kernels back to back: two range shuffles, two checkpoints, two
    * offset collects, two broadcast joins over the same frame. Here the
    * frame is range-partitioned ONCE; the (pid × group) table collects
    * BOTH the partition value sums and the partition minima of the
    * local running sum, from which the driver derives each partition's
    * exclusive prefix sum `off` and exclusive prefix-min `moff` =
    * min over lower partitions of (their off + their local min); then
    *   sumCol = off + local_run,
    *   minCol = least(moff, off + running-min(local_run)).
    * `value` must be non-null integral. Verified against the window
    * form in RanksSpec. */
  def perGroupPrefixSumMin(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, sumCol: String, minCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val keyCols = col("__pid") +: group.map(col)
    // the running sum and its running min computed ONCE, materialized
    // with the frame: the offset collect below is then a cheap scan of
    // the checkpoint instead of a second window computation
    val localW = Window.partitionBy(keyCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pinned = ranged
      .withColumn("__run", sum(col("__v")).over(localW))
      .withColumn("__runmin", min(col("__run")).over(localW))
      .localCheckpoint()
    val sums = pinned.groupBy(keyCols: _*)
      .agg(sum("__v").as("__s"), min("__run").as("__m"))
      .limit(maxOffsetEntries + 1).collect()
    require(sums.length <= maxOffsetEntries,
      s"Ranks.perGroupPrefixSumMin: (partition x group) offset table exceeds " +
        s"$maxOffsetEntries entries - the group key ${group.mkString(",")} " +
        "is not driver-bounded; use a window form or coarser key")
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = sums.groupBy(keyOf)
    val offRows = sums.map { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val lower = byGroup(k).filter(_.getInt(0) < pid).sortBy(_.getInt(0))
      val off = lower.map(_.getLong(r.length - 2)).sum
      // exclusive prefix-min of the GLOBAL running sum = min over lower
      // partitions of (that partition's exclusive prefix sum + its
      // local min); identity when no lower partition holds the group
      var acc = 0L
      var moff = Long.MaxValue
      for (lr <- lower) {
        moff = math.min(moff, acc + lr.getLong(r.length - 1))
        acc += lr.getLong(r.length - 2)
      }
      Row.fromSeq(r.toSeq.dropRight(2) ++ Seq(off, moff))
    }
    val offSchema = StructType(
      pinned.select(keyCols: _*).schema.fields ++ Seq(
        StructField("__off", LongType, nullable = false),
        StructField("__moff", LongType, nullable = false)))
    val offDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val ogCols = group.indices.map(i => s"__og$i")
    val offAliased = offDf.toDF(("__opid" +: ogCols) ++ Seq("__off", "__moff"): _*)
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__og$i") }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    pinned
      .join(broadcast(offAliased), joinCond)
      .withColumn(sumCol, col("__off") + col("__run"))
      .withColumn(minCol,
        when(col("__moff") === Long.MaxValue, col("__off") + col("__runmin"))
          .otherwise(least(col("__moff"), col("__off") + col("__runmin"))))
      .drop("__pid" +: "__v" +: "__run" +: "__runmin" +: "__off" +: "__moff" +:
        "__opid" +: ogCols: _*)
  }

  /** [[perGroupRank]] and [[perGroupPrefixSum]] over the SAME order
    * FUSED into one kernel pass, plus the per-group value total as a
    * free column: adds `rankCol` (1-based), `nCol` (group row count),
    * `sumCol` (inclusive running sum of `value`) and `sumTotalCol`
    * (the group's total of `value`). The (pid × group) collect carries
    * (count, value-sum) per cell, so every offset and total derives
    * from ONE table; the local pass is one sort with a row_number and
    * a framed running sum. The r9 callers needing rank + running sum
    * (events_changepoint) paid two full kernel passes plus a separate
    * group-total aggregate + broadcast join. `value` must be non-null
    * integral. Verified against the window form in RanksSpec. */
  def perGroupRankAndPrefixSum(df: DataFrame, group: Seq[String],
      order: Seq[Column], value: Column, rankCol: String, nCol: String,
      sumCol: String, sumTotalCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val pinned = ranged.localCheckpoint()
    val keyCols = col("__pid") +: group.map(col)
    val sums = pinned.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__c"), sum("__v").as("__s"))
      .limit(maxOffsetEntries + 1).collect()
    require(sums.length <= maxOffsetEntries,
      s"Ranks.perGroupRankAndPrefixSum: (partition x group) offset table " +
        s"exceeds $maxOffsetEntries entries - the group key " +
        s"${group.mkString(",")} is not driver-bounded; use a window form " +
        "or coarser key")
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = sums.groupBy(keyOf)
    val offRows = sums.map { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val lower = byGroup(k).filter(_.getInt(0) < pid)
      val rankOff = lower.map(_.getLong(r.length - 2)).sum
      val sumOff = lower.map(_.getLong(r.length - 1)).sum
      val nTot = byGroup(k).map(_.getLong(r.length - 2)).sum
      val sTot = byGroup(k).map(_.getLong(r.length - 1)).sum
      Row.fromSeq(r.toSeq.dropRight(2) ++ Seq(rankOff, sumOff, nTot, sTot))
    }
    val offSchema = StructType(
      pinned.select(keyCols: _*).schema.fields ++ Seq(
        StructField("__roff", LongType, nullable = false),
        StructField("__soff", LongType, nullable = false),
        StructField(nCol, LongType, nullable = false),
        StructField(sumTotalCol, LongType, nullable = false)))
    val offDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val ogCols = group.indices.map(i => s"__og$i")
    val offAliased = offDf.toDF(
      ("__opid" +: ogCols) ++ Seq("__roff", "__soff", nCol, sumTotalCol): _*)
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__og$i") }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pinned
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .withColumn("__lrun", sum(col("__v")).over(framed))
      .join(broadcast(offAliased), joinCond)
      .withColumn(rankCol, col("__roff") + col("__lrn"))
      .withColumn(sumCol, col("__soff") + col("__lrun"))
      .drop("__pid" +: "__v" +: "__lrn" +: "__lrun" +: "__roff" +: "__soff" +:
        "__opid" +: ogCols: _*)
  }

  /** Per-group LEAD of `value` under `order` without a per-group window
    * task OR a rank self-join: range-partition on (group, order), local
    * lead within each (partition, group), and the one value a partition
    * tail cannot see — the FIRST `value` of the same group in the next
    * partition holding it — collected (partition × group table,
    * model-sized) and re-attached by broadcast join. The r9 callers
    * paid a full rank-kernel pass PLUS a data-sized shuffle self-join
    * on (group, rank) for exactly this. Adds `leadCol` (null at the
    * true group tail, as LEAD defines). `order` is PLAIN columns,
    * ascending (min_by over their struct is the partition head — a
    * SortOrder is unevaluable inside a struct), and must totally order
    * rows within a group. Verified against the window form in
    * RanksSpec. */
  def perGroupLead(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, leadCol: String, partitions: Int,
      maxOffsetEntries: Int = MaxOffsetEntries): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val fullOrder = group.map(col) ++ order
    val ranged = df.repartitionByRange(partitions, fullOrder: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
    val keyCols = col("__pid") +: group.map(col)
    val pinned = ranged.localCheckpoint()
    // first __v of each (pid, group) under the order: min_by over the
    // pinned frame — one model-sized collect
    val heads = pinned.groupBy(keyCols: _*)
      .agg(min_by(col("__v"), struct(order: _*)).as("__h"))
      .limit(maxOffsetEntries + 1).collect()
    require(heads.length <= maxOffsetEntries,
      s"Ranks.perGroupLead: (partition x group) offset table exceeds " +
        s"$maxOffsetEntries entries - the group key ${group.mkString(",")} " +
        "is not driver-bounded; use a window form or coarser key")
    val keyOf: Row => Seq[Any] = r => group.indices.map(i => r.get(1 + i))
    val byGroup = heads.groupBy(keyOf)
    // per (pid, group): the next partition holding the group, and its
    // first value (None at the group's last partition)
    val nextRows = heads.flatMap { r =>
      val k = keyOf(r)
      val pid = r.getInt(0)
      val later = byGroup(k).filter(_.getInt(0) > pid)
      if (later.isEmpty) None
      else {
        val nxt = later.minBy(_.getInt(0))
        Some(Row.fromSeq(r.toSeq.dropRight(1) :+ nxt.getLong(r.length - 1)))
      }
    }
    val nextSchema = StructType(
      pinned.select(keyCols: _*).schema.fields :+
        StructField("__nexth", LongType, nullable = false))
    val nextDf = pinned.sparkSession.createDataFrame(
      java.util.Arrays.asList(nextRows.toIndexedSeq: _*), nextSchema)
    val ogCols = group.indices.map(i => s"__og$i")
    val nextAliased = nextDf.toDF(("__opid" +: ogCols) :+ "__nexth": _*)
    val joinCond = group.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__og$i") }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    val localW = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    pinned
      .withColumn("__lead", lead(col("__v"), 1).over(localW))
      .join(broadcast(nextAliased), joinCond, "left")
      .withColumn(leadCol, coalesce(col("__lead"), col("__nexth")))
      .drop("__pid" +: "__v" +: "__lead" +: "__nexth" +: "__opid" +: ogCols: _*)
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
