package graft

import org.apache.spark.sql.functions._

import graft.ops.Wave97

/** Wave-97 semantics: the WAV codec roundtrip is sample-exact (the
  * identity the audio oracle leans on), the watermark detector matches
  * a local bigram replay and fires at the expected false-positive rate
  * on the unwatermarked fixture, and Bradley–Terry ratings are a
  * deterministic fixed-point consistent with win rates. */
class Wave97Spec extends SparkSuite {

  test("WAV roundtrip is sample-exact and a real RIFF container") {
    for (docId <- Seq(0L, 1L, 42L, 12345L, Long.MaxValue - 7)) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId#audio".getBytes("UTF-8"))
      val h64 = java.lang.Long.parseLong(
        h.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
      val h1 = java.lang.Math.floorMod(h64, 65536L)
      val h2 = java.lang.Math.floorMod(h64 / 65536L, 65536L)
      val wav = Wave97.wavBytes(h1, h2)
      assert(wav(0) === 'R'.toByte && wav(1) === 'I'.toByte &&
        wav(2) === 'F'.toByte && wav(3) === 'F'.toByte,
        "real WAV encoder must emit a RIFF container")
      val decoded = Wave97.decodeWav(wav)
      assert(decoded.length === Wave97.AudioN)
      for (t <- 0 until Wave97.AudioN)
        assert(decoded(t) === Wave97.audioSample(h1, h2, t.toLong),
          s"doc $docId sample $t corrupted by the codec roundtrip")
    }
  }

  test("multimodal_decode_audio features replay from the formula") {
    val rows = SparkEntry.queries("multimodal_decode_audio")(spark, sf).collect()
    assert(rows.length === 500)
    val r = rows.head
    assert(r.getInt(r.fieldIndex("n_samples")) === Wave97.AudioN)
    // bins partition the samples
    val binSum = (0 to 7).map(b => r.getLong(r.fieldIndex(s"b$b"))).sum
    assert(binSum === Wave97.AudioN.toLong)
    // rms_floor <= peak, zero_cross < n
    assert(r.getLong(r.fieldIndex("rms_floor")) <= r.getLong(r.fieldIndex("peak")))
    assert(r.getLong(r.fieldIndex("zero_cross")) < Wave97.AudioN.toLong)
  }

  test("text_watermark_detect matches a local bigram replay; FP rate sane") {
    val rows = SparkEntry.queries("text_watermark_detect")(spark, sf).collect()
    assert(rows.nonEmpty)
    // local replay for a handful of docs
    val docs = graft.engine.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").limit(5).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    for (d <- docs) {
      val toks = d.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length >= 2) {
        val green = toks.sliding(2).count { case Array(a, b) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$a#wm#$b".getBytes("UTF-8"))
            .map(x => f"$x%02x").mkString.substring(0, 15)
          java.lang.Long.parseLong(hex, 16) % 2 == 0
        }
        val r = byId(d.getLong(0))
        assert(r.getLong(r.fieldIndex("n_scored")) === toks.length - 1L)
        assert(r.getLong(r.fieldIndex("n_green")) === green.toLong)
      }
    }
    // unwatermarked fixture: suspicion fires at roughly the z>=2 tail
    val fp = rows.count(_.getBoolean(rows.head.fieldIndex("suspect")))
    assert(fp.toDouble / rows.length < 0.12,
      s"$fp/${rows.length} docs flagged - green list is not behaving like gamma=1/2")
    // corpus-wide green fraction near 1/2
    val g = rows.map(r => r.getLong(r.fieldIndex("n_green"))).sum.toDouble
    val n = rows.map(r => r.getLong(r.fieldIndex("n_scored"))).sum.toDouble
    assert(math.abs(g / n - 0.5) < 0.02, s"corpus green fraction ${g / n}")
  }

  test("eval_bradley_terry: deterministic, positive, win-rate-consistent") {
    val a = SparkEntry.queries("eval_bradley_terry")(spark, sf).collect()
    val b = SparkEntry.queries("eval_bradley_terry")(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "ratings must replay bit-identically")
    assert(a.nonEmpty)
    val iRating = a.head.fieldIndex("rating")
    val iWins = a.head.fieldIndex("wins")
    val iGames = a.head.fieldIndex("games")
    a.foreach(r => assert(r.getDouble(iRating) >= 0.0))
    // the top-rated source must not have the worst win rate, and the
    // bottom-rated must not have the best (MM ratings track win rates)
    val byRating = a.sortBy(_.getDouble(iRating))
    def wr(r: org.apache.spark.sql.Row) =
      r.getLong(iWins).toDouble / r.getLong(iGames)
    val rates = a.map(wr)
    assert(wr(byRating.last) > rates.min - 1e-9)
    assert(wr(byRating.head) < rates.max + 1e-9)
    assert(wr(byRating.last) >= wr(byRating.head),
      "top-rated source must beat bottom-rated on raw win rate")
  }
}
