package graft

/** Round-7 plan contracts: the physical properties the new kernels'
  * scale claims rest on (PLANS.md round-7 entries). */
class Wave87PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("sim_topk_batch: partial WindowGroupLimit below the exchange") {
    val p = plan("sim_topk_batch")
    // the bounded-shuffle contract: a Partial group-limit on the map
    // side means at most k rows per (query × partition) ship
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("Partial"), p.take(2000))
    // the query table rides as a broadcast, the corpus never shuffles
    // before scoring
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
  }

  test("dq_referential: every FK edge is an anti-join with a distinct build side") {
    val p = plan("dq_referential")
    assert(p.contains("LeftAnti"), p.take(2000))
    // the parent key set deduplicates before the join (HashAggregate
    // on the build side) — six edges, six anti-joins
    assert("LeftAnti".r.findAllIn(p).size === 6, "six FK edges")
  }

  test("dq_expectations: one aggregate per table, no joins") {
    val p = plan("dq_expectations")
    assert(!p.contains("Join"), "constraint suite must not join")
    // three tables -> three aggregation subtrees under the union
    assert(p.contains("Union"), p.take(500))
  }

  test("pii_pseudonymize: narrow map, no exchange before the output sort") {
    val p = plan("pii_pseudonymize")
    val shuffles = "Exchange".r.findAllIn(p).size
    // exactly the rangepartitioning for the final orderBy — pseudonym
    // derivation itself must stay narrow
    assert(shuffles <= 2, s"expected only the output-sort exchange:\n$p")
  }
}
