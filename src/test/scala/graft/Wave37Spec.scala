package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-37 semantics: readability counts tie out against a local
  * replay; boilerplate shingles really appear in >= 3 distinct docs
  * and df counts each doc once. */
class Wave37Spec extends SparkSuite {

  test("text_readability: counts match a local replay; flesch from its own sums") {
    val rows = SparkEntry.queries("text_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getString(0)
      val texts = bySource(src).map(_._2)
      assert(r.getLong(1) === texts.length.toLong)
      val words = texts.map(t =>
        "[^a-z0-9]+".r.split(t.toLowerCase).count(_.nonEmpty).toLong).sum
      val sents = texts.map(t =>
        math.max(1L, "[.!?]+".r.findAllIn(t).length.toLong)).sum
      val syls = texts.map(t =>
        "[aeiou]+".r.findAllIn(t.toLowerCase).length.toLong).sum
      assert(r.getLong(2) === words, s"$src words")
      assert(r.getLong(3) === sents, s"$src sentences")
      assert(r.getLong(4) === syls, s"$src syllables")
      val flesch = 206.835 - 1.015 * (words.toDouble / sents) -
        84.6 * (syls.toDouble / words)
      assert(math.abs(r.getDouble(7) - flesch) < 1e-5)
    }
  }

  test("text_boilerplate: every reported 5-gram occurs in df distinct docs, df >= 3") {
    val rows = SparkEntry.queries("text_boilerplate")(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val tk = "[^a-z0-9]+".r.split(r.getString(2).toLowerCase)
          .filter(_.nonEmpty)
        (r.getLong(0), r.getString(1),
          tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet)
      }
    // dfs ordered non-increasing, all >= 3
    val dfs = rows.map(_.getLong(1))
    assert(dfs.sameElements(dfs.sortBy(-_)))
    rows.foreach { r =>
      val sh = r.getString(0)
      val holders = docs.filter(_._3.contains(sh))
      assert(r.getLong(1) === holders.length.toLong, s"df of '$sh'")
      assert(r.getLong(1) >= 3L)
      assert(r.getLong(2) === holders.map(_._2).distinct.length.toLong)
    }
    // and top-20 completeness: no unreported shingle has higher df than
    // the last reported one (when 20 rows were produced)
    if (rows.length == 20) {
      val reported = rows.map(_.getString(0)).toSet
      val all = docs.flatMap(_._3).groupBy(identity).view.mapValues(_.length)
      val maxUnreported = all.filter { case (k, _) => !reported(k) }.values
        .foldLeft(0)(math.max)
      assert(maxUnreported <= rows.last.getLong(1))
    }
  }
}
