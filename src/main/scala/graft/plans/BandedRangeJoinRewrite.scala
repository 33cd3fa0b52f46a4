package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Banded range-join rewrite: an opt-in `Rule[LogicalPlan]` that turns
  *
  *   L JOIN R ON abs(l.x - r.y) <= c          (no equi key!)
  *
  * into a hash EQUI-join on a computed band key. Without an equi key,
  * Catalyst's only plan for a large-large join is a (broadcast) nested
  * loop — quadratic and memory-bound at scale. With the rewrite, the
  * point side keys by floor(y/c), the interval side EXPLODES to the <= 3
  * bands [floor((x-c)/c), floor((x+c)/c)] its window overlaps, the join
  * hash-partitions on the band, and the ORIGINAL predicate re-verifies
  * inside the band group (it stays in the join condition, so the rewrite
  * is correct for any band placement; each (row, row) pair meets in
  * exactly one band — the point's — so no dedup step is needed).
  *
  * This is the rule form of ops/Joins.joinRangeBanded (which composes
  * the same shape manually, plus an interior/edge count decomposition no
  * generic rule can see), and the concrete answer to SURVEY §4.3's
  * revisit clause — the session flag `spark.graft.bandedRangeJoin=true`
  * turns it on; queries keep their declarative theta-join form.
  *
  * Scope guards (deliberately narrow): INNER joins whose entire
  * condition is one `abs(a - b) <= lit(c)` with DOUBLE-typed sides
  * split cleanly across the children and a finite positive literal c.
  * The marker band attribute name guards against re-firing on an
  * already-rewritten join.
  */
case class BandedRangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val BandCol = "__graft_band"

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.bandedRangeJoin").exists(_.toBoolean)

  /** floor(e / w) as a long band id. */
  private def bandOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(e, Literal(w, DoubleType))), LongType)

  /** (intervalSide, pointSide, x, y): `x` lives entirely on the interval
    * side, `y` entirely on the point side. */
  private def orient(left: LogicalPlan, right: LogicalPlan, a: Expression, b: Expression)
      : Option[(LogicalPlan, LogicalPlan, Expression, Expression)] =
    if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
      Some((left, right, a, b))
    else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      Some((right, left, a, b))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(cond @ LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(c: Double, DoubleType))), hint)
          if c > 0 && !c.isInfinite && !c.isNaN &&
            a.dataType == DoubleType && b.dataType == DoubleType &&
            j.output.forall(_.name != BandCol) &&
            orient(left, right, a, b).isDefined =>
        val (intervalSide, pointSide, x, y) = orient(left, right, a, b).get
        val bandAttr = AttributeReference(BandCol, LongType, nullable = true)()
        val lo = bandOf(Subtract(x, Literal(c, DoubleType)), c)
        val hi = bandOf(Add(x, Literal(c, DoubleType)), c)
        // Sequence is TimeZoneAware: without an explicit zone the new node
        // is unresolved and the optimizer's plan-integrity check fails
        val seq = Sequence(lo, hi, None,
          Some(spark.sessionState.conf.sessionLocalTimeZone))
        val gen = Generate(
          Explode(seq),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(bandAttr),
          child = intervalSide)
        val newCond = And(EqualTo(bandAttr, bandOf(y, c)), cond)
        Project(j.output, Join(gen, pointSide, Inner, Some(newCond), hint))
    }
}
