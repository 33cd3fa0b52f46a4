package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Wave-83 semantics: conformal replays from a local split pipeline;
  * the shard manifest replays from a local byte walk. */
class Wave83Spec extends SparkSuite {

  private def md5hex(s2: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(tx: String): String = {
    val b = java.lang.Long.parseLong(md5hex(tx + "#conformal").substring(0, 15),
      16) % 10
    if (b <= 6) "train" else if (b <= 8) "val" else "test"
  }

  test("ml_conformal_interval: local split-conformal replay; coverage high") {
    val row = SparkEntry.queries("ml_conformal_interval")(spark, sf).head
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val tx = r.getString(1)
        (r.getLong(0), splitOf(tx), BigInt(tx.length),
          BigInt(tx.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)))
      }
    val tr = docs.filter(_._2 == "train")
    val n = BigInt(tr.length)
    val mx = (2 * tr.map(_._3).sum * 1000 + n) / (2 * n)
    val my = (2 * tr.map(_._4).sum * 1000 + n) / (2 * n)
    var sxx, sxy = BigInt(0)
    tr.foreach { d =>
      val dx = d._3 * 1000 - mx; val dy = d._4 * 1000 - my
      sxx += dx * dx; sxy += dx * dy
    }
    val b1m =
      if (sxx == 0) BigInt(0)
      else sxy.signum * ((2 * sxy.abs * 1000000 + sxx) / (2 * sxx))
    val b0n = my * 1000000 - b1m * mx
    def res(d: (Long, String, BigInt, BigInt)): BigInt =
      (d._4 * BigInt(1000000000L) - b0n - b1m * d._3 * 1000).abs
    val cal = docs.filter(_._2 == "val").map(d => (res(d), d._1)).sorted
    val k = (9 * (cal.length + 1) + 9) / 10
    val qNano = cal(k - 1)._1
    val tst = docs.filter(_._2 == "test")
    val covered = tst.count(d => res(d) <= qNano).toLong
    assert(row.getLong(0) === tr.length.toLong)
    assert(row.getLong(1) === cal.length.toLong)
    assert(row.getLong(2) === tst.length.toLong)
    assert(math.abs(row.getDouble(3) - b0n.toDouble / 1e9) < 1e-6)
    assert(math.abs(row.getDouble(4) - b1m.toDouble / 1e6) < 1e-9)
    assert(math.abs(row.getDouble(5) - qNano.toDouble / 1e9) < 1e-6)
    val covExp = ((2 * BigInt(covered) * 1000000 + tst.length) /
      (2 * BigInt(tst.length))).toDouble / 1e6
    assert(math.abs(row.getDouble(6) - covExp) < 1e-9)
    // conformal validity is an expectation over splits; on a fixed
    // fixture we assert the sane band, not the exact 90%
    assert(row.getDouble(6) > 0.6 && row.getDouble(6) <= 1.0)
  }

  test("multimodal_shards: local byte-walk replay; manifest tiles the corpus") {
    val out = SparkEntry.queries("multimodal_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length.toLong))
      .sortBy(_._1)
    var cum = 0L
    val assigned = docs.map { case (id, nb) =>
      val start = cum; cum += nb; (start / 65536L, id, nb, start)
    }
    val expect = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (sh, v) =>
      (sh, v.size.toLong, v.map(_._3).sum, v.map(_._2).min, v.map(_._2).max,
        v.map(_._4).min)
    }
    assert(out.toSeq === expect)
    // shards tile the byte stream: consecutive ids, full coverage
    assert(out.map(_._2).sum === docs.length.toLong)
    assert(out.map(_._3).sum === docs.map(_._2).sum)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, "id ranges do not overlap")
      case _ =>
    }
  }
}
