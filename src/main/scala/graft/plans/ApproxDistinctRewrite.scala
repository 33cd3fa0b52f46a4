package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Approximation mode: a `Rule[LogicalPlan]` that rewrites exact
  * `count(DISTINCT x)` aggregates to HyperLogLog++ sketches when the
  * session opts in with `spark.graft.approxDistinct=true`.
  *
  * Why a Rule and not a different query: at 100 TB an exact distinct
  * count forces either an Expand (per-distinct-aggregate row
  * multiplication) or a two-phase distinct shuffle of every distinct
  * value; HLL++ is one pass with a sketch-sized (KiB) shuffle. The flag
  * lets an exploratory profiling session trade <=5% relative error for
  * that plan WITHOUT rewriting queries — the engine's query surface is
  * unchanged, the optimizer swaps the physical cost. This is SURVEY §4.3's
  * "revisit" clause exercised through the sanctioned extension point
  * (`SparkSessionExtensions.injectOptimizerRule`, registered in
  * GraftExtensions alongside the native-function injections).
  *
  * Scope guards: only single-argument COUNT(DISTINCT x) rewrites —
  * multi-column distinct counts and DISTINCT in other aggregates (sum,
  * avg) keep exact semantics; FILTER clauses are preserved (the filter
  * rides on the AggregateExpression, not the function).
  *
  * The rule is injected early in operator optimization, before Catalyst's
  * RewriteDistinctAggregates lowers distinct aggregates to Expand — the
  * pattern below relies on seeing the logical `isDistinct` flag intact.
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxDistinct")
      .exists(_.trim.equalsIgnoreCase("true"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(child),
            isDistinct = false)
      }
    }
}
