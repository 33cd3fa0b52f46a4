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
  * point side keys by floor(y/c), the interval side EXPLODES to the <= 7
  * bands [floor((x-3c)/c), floor((x+3c)/c)] its widened window overlaps
  * (two guard bands per side absorb float rounding of the
  * double-evaluated predicate), the join hash-partitions on the band,
  * and the ORIGINAL predicate re-verifies inside the band group (it
  * stays in the join condition, so the rewrite is correct for any band
  * placement; each (row, row) pair meets in exactly one band — the
  * point's — so no dedup step is needed).
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
    spark.conf.getOption("spark.graft.bandedRangeJoin")
      .exists(_.trim.equalsIgnoreCase("true"))

  /** floor(e / w) as a long band id. LEGACY eval mode throughout: under
    * ANSI (Spark 4's default) an out-of-range double->long cast THROWS,
    * but the guard-band containment argument relies on the legacy
    * SATURATING cast (monotone pin to Long.Min/MaxValue). */
  private def bandOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(e, Literal(w, DoubleType))), LongType,
      timeZoneId = None, EvalMode.LEGACY)

  /** (intervalSide, pointSide, swapped): the interval side hosts `a`, the
    * point side hosts `b`; `swapped` records whether the children were
    * reversed (the JoinHint's legs must flip with them). */
  private def orient(left: LogicalPlan, right: LogicalPlan, a: Expression, b: Expression)
      : Option[(LogicalPlan, LogicalPlan, Boolean)] =
    if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
      Some((left, right, false))
    else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      Some((right, left, true))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner,
          Some(cond @ LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(c: Double, DoubleType))), hint)
          // c bounded to a physically sane range so 3c can never overflow
          // and ulp-vs-c reasoning in the guard-band argument holds
          if c >= 1e-150 && c <= 1e150 &&
            a.dataType == DoubleType && b.dataType == DoubleType &&
            j.output.forall(_.name != BandCol) =>
        orient(left, right, a, b) match {
          case None => j // references straddle both sides: out of scope
          case Some((intervalSide, pointSide, swapped)) =>
            val (x, y) = (a, b)
            val bandAttr = AttributeReference(BandCol, LongType, nullable = true)()
            // GUARD BANDS, computed as x±3c BEFORE the floor: the join
            // predicate is evaluated in doubles, so fl(|x-y|) <= c can hold
            // for a y marginally OUTSIDE the real interval [x-c, x+c]
            // (subtraction rounding <= ~ulp(c), and x±3c itself rounds by
            // <= 0.5*ulp(x) <= c whenever ulp(x) <= 2c — when ulp(x) > 2c
            // the only float-matching point is y == x exactly). Two spare
            // width-c bands dwarf every such term, so every float-admitted
            // pair's point band lies inside [band(x-3c), band(x+3c)]. The
            // double->long casts saturate monotonically, so coverage also
            // survives at the representable-range edges (both sides pin to
            // the same saturated band).
            val lo = bandOf(Subtract(x, Literal(3 * c, DoubleType)), c)
            val hi0 = bandOf(Add(x, Literal(3 * c, DoubleType)), c)
            // span clamp without long wrap-around: the widened range spans
            // mathematically at most 7 bands (hi <= lo + 6). LEGACY Add: if
            // lo sits at the saturation ceiling, lo+6 wraps negative (ANSI
            // would throw), Least picks the wrapped value and Greatest
            // restores hi = lo — a single saturated band, which is exactly
            // where any matching point's band saturates too.
            val hi = Greatest(Seq(lo,
              Least(Seq(hi0, Add(lo, Literal(6L), EvalMode.LEGACY)))))
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
            val newHint = if (swapped) JoinHint(hint.rightHint, hint.leftHint) else hint
            Project(j.output, Join(gen, pointSide, Inner, Some(newCond), newHint))
        }
    }
}
