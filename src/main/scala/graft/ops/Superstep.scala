package graft.ops

import org.apache.spark.sql.SparkSession

/** The fixed-shape-loop execution scope (the graph_hits superstep recipe,
  * now shared): run `body` with AQE off and a caller-chosen shuffle
  * partition count, restoring the session conf afterwards.
  *
  * WHEN this is right: `body` is a fixed, tiny plan shape executed
  * repeatedly — a model-state iteration (EM / Lloyd / Newton step, graph
  * peel round) whose every aggregate output is MODEL-sized (a handful of
  * groups). There, adaptive replanning is pure overhead: each exchange
  * becomes its own stage-job plus a replanning round-trip, measured at
  * 2-3x the job count per round on local[32] and the same scheduler
  * round-trips on a cluster. The reduce side of such an aggregate
  * receives only (#map-partitions x #groups) partially-aggregated rows,
  * so `partitions = 1` is the right width at ANY data scale — the map
  * side keeps the input's full parallelism.
  *
  * WHEN it is wrong: any data-sized pass (scan, join, explode, wide
  * groupBy). Those must materialize EAGERLY (localCheckpoint) BEFORE
  * entering the scope so they run under the session's AQE with skew
  * mitigation — the caller's responsibility, asserted per call site by
  * the plan-contract specs. */
object Superstep {
  /** Serialized through [[graft.engine.ConfScope]]: session conf is
    * global, so an unserialized capture/restore racing another scope
    * (e.g. a streaming micro-batch's tiny-merge override) can leave the
    * session stuck on the override. */
  def scoped[A](s: SparkSession, partitions: Int = 1)(body: => A): A =
    graft.engine.ConfScope.withConf(s, Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> partitions.toString))(body)
}
