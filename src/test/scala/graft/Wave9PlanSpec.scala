package graft

/** Physical-plan shape assertions for the wave-9 retrieval operators:
  * the inverted index only pays for the terms a query names — the term
  * predicate must reach the index scan as a pushed parquet filter, so
  * term-sorted files/row groups outside the query's term set are
  * skipped by footer stats, never read. */
class Wave9PlanSpec extends SparkSuite {

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("search_inverted pushes the term set to the index scan; one doc-keyed aggregation") {
    val plan = planOf("search_inverted")
    assert(plan.contains("PushedFilters: [In(term"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // posting intersection is the aggregation itself - no join needed
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("search_phrase pulls only the two phrase terms' postings into the adjacency join") {
    val plan = planOf("search_phrase")
    // each side of the positional join carries its own pushed single-term
    // equality - the index is probed, not scanned
    assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,hash)")
      || plan.contains("PushedFilters: [EqualTo(term,hash)"), plan.take(3000))
    assert(plan.contains("EqualTo(term,join)"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
}
