package graft

import graft.engine.Tables

/** Wave-58 semantics: novelty deciles replay from a local first-seen
  * scan; the V-optimal DP replays from a local Bellman recursion and
  * is monotone in the bucket budget. */
class Wave58Spec extends SparkSuite {

  test("text_novelty: deciles replay from a local first-seen scan") {
    val rows = SparkEntry.queries("text_novelty")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .sortBy(_._1)
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    val docTris = docs.map { case (id, tk) =>
      id -> (if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
             else Set.empty[String])
    }
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    docTris.foreach { case (id, g) =>
      g.foreach(t => if (!firstSeen.contains(t)) firstSeen(t) = id)
    }
    val expected = docTris.flatMap { case (id, g) =>
      g.toSeq.map(t => (math.min(9L, (id - lo) * 10 / (hi - lo + 1)),
        if (firstSeen(t) == id) 1L else 0L))
    }.groupBy(_._1).map { case (d, v) => d -> (v.length.toLong, v.map(_._2).sum) }
    assert(rows === expected)
    // early corpus is (weakly) more novel than late corpus
    val first = rows(rows.keys.min); val lastd = rows(rows.keys.max)
    assert(first._2.toDouble / first._1 >= lastd._2.toDouble / lastd._1)
  }

  test("profile_voptimal: local Bellman replay, monotone in k") {
    val rows = SparkEntry.queries("profile_voptimal")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows.keys.toSeq.sorted === (1 to 8))
    val vc = Tables.load(spark, sf, "lineitem")
      .select("l_quantity").collect()
      .map(r => math.round(r.getDouble(0) * 100))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      .toSeq.sortBy(_._1)
    val vs = vc.map(_._1)
    // prefix moments
    val p0 = vc.scanLeft(0L)(_ + _._2).tail
    val p1 = vc.scanLeft(0L)((a, b) => a + b._2 * b._1).tail
    val p2 = vc.scanLeft(0L)((a, b) => a + b._2 * b._1 * b._1).tail
    def sse(i: Int, j: Int): Long = { // bucket (i, j] by index, i = -1 for prefix
      val n = p0(j) - (if (i < 0) 0L else p0(i))
      val m1 = p1(j) - (if (i < 0) 0L else p1(i))
      val m2 = p2(j) - (if (i < 0) 0L else p2(i))
      val num = BigInt(m2) * n - BigInt(m1) * m1
      ((2 * num + n) / (2 * n)).toLong
    }
    var dp = vs.indices.map(j => sse(-1, j)).toArray
    val expect = scala.collection.mutable.Map(1 -> dp.last)
    for (k <- 2 to 8) {
      dp = vs.indices.map { j =>
        val viaSplit = (0 until j).map(i => dp(i) + sse(i, j))
        (dp(j) +: viaSplit).min
      }.toArray
      expect(k) = dp.last
    }
    (1 to 8).foreach { k =>
      assert(rows(k) === expect(k).toDouble, s"k=$k: ${rows(k)} vs ${expect(k)}")
    }
    (1 to 7).foreach(k => assert(rows(k) >= rows(k + 1), s"not monotone at $k"))
  }
}
