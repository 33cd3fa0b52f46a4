package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-30 semantics: triangle count matches a driver-side enumeration,
  * centroid classification beats chance and covers every vector, the
  * round-trip audit is lossless exactly on OOV-free docs. */
class Wave30Spec extends SparkSuite {

  test("graph_triangles: count matches a driver-side enumeration") {
    val row = SparkEntry.queries("graph_triangles")(spark, sf).head
    val (nTri, nEdges, nNodes) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nNodes > 0 && nEdges > 0)
    // rebuild edge set driver-side with identical support rule
    val basket = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(Tables.load(spark, sf, "part")
        .select(col("p_partkey"), col("p_brand").as("brand")),
        col("l_partkey") === col("p_partkey"))
      .select("ok", "brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nOrders = basket.map(_._1).distinct.length
    val pairCnt = basket.groupBy(_._1).toSeq.flatMap { case (_, bs) =>
      val brands = bs.map(_._2).distinct.sorted
      for (i <- brands.indices; j <- i + 1 until brands.length)
        yield (brands(i), brands(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairCnt.filter { case (_, c) => c * 50 >= nOrders }.keys.toSet
    assert(nEdges === edges.size.toLong)
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(nNodes === nodes.size.toLong)
    // nodes must iterate as a Seq: a Set generator would dedupe the
    // yielded markers and silently undercount
    val tri = (for {
      (a, b) <- edges.toSeq
      c <- nodes.toSeq if c > b
      if edges.contains((b, c)) && edges.contains((a, c))
    } yield 1).size
    assert(nTri === tri.toLong, s"kernel $nTri vs replay $tri")
    assert(nTri > 0, "fixture graph must close some triangles")
  }

  test("sim_nearest_centroid: full coverage, far better than the 1/k chance rate") {
    val rows = SparkEntry.queries("sim_nearest_centroid")(spark, sf).collect()
    val e = Tables.load(spark, sf, "embeddings")
    assert(rows.map(_.getLong(1)).sum === e.count())
    val k = rows.length
    val overall = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(overall > 2.0 / k,
      s"centroid accuracy $overall not above 2x chance 1/$k")
    rows.foreach { r =>
      val rec = r.getDouble(r.fieldIndex("recall"))
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("tokenize_roundtrip: consistency holds for every doc; lossless = OOV-free") {
    val rows = SparkEntry.queries("tokenize_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every doc's only mismatches are its OOV positions (id-0 holes)
      assert(r.getLong(r.fieldIndex("n_consistent")) ===
        r.getLong(r.fieldIndex("n_docs")), r.getString(0))
      assert(r.getLong(r.fieldIndex("n_lossless")) <=
        r.getLong(r.fieldIndex("n_docs")))
    }
    // lossless count ties exactly to the OOV-free docs computed directly
    val vocab = SparkEntry.queries("vocab_build")(spark, sf)
      .select("token").collect().map(_.getString(0)).toSet
    val oovFree = Tables.load(spark, sf, "documents")
      .select(col("source"), graft.ops.LlmPipeline.tokens(col("text")).as("tk"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
      .groupBy(_._1).view
      .mapValues(_.count(_._2.forall(vocab.contains)).toLong).toMap
    rows.foreach(r => assert(r.getLong(2) === oovFree(r.getString(0)), r.getString(0)))
  }
}
