package graft

/** Wave-96 behavior: Benford bookkeeping and span-corruption manifest
  * invariants. */
class Wave96Spec extends SparkSuite {

  test("corpus_span_corruption: manifest accounting and rate law") {
    val rows = SparkEntry.queries("corpus_span_corruption")(spark, sf).collect()
    assert(rows.nonEmpty)
    var tok = 0L; var masked = 0L
    rows.foreach { r =>
      val (n, spans, m, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n > 0 && m >= 0 && m <= n)
      // every masked token lives in a masked 8-cell; a span never holds
      // more than 8 tokens
      assert(spans * 8 >= m, s"spans=$spans cannot cover masked=$m")
      assert(m >= spans, s"a masked span masks at least one token")
      assert(math.abs(rate - m.toDouble / n) < 1e-5)
      tok += n; masked += m
    }
    // the 15% md5 gate realizes close to 15% corpus-wide
    val overall = masked.toDouble / tok
    assert(overall > 0.10 && overall < 0.20, s"corpus corruption rate $overall")
    // deterministic manifest: replay is identical
    val again = SparkEntry.queries("corpus_span_corruption")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
