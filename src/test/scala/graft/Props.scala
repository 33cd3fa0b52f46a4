package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the pure (non-Spark) kernels — the bit
  * math behind z-ordering and the reference model of the salted
  * aggregation (SURVEY.md §5.2 item 3). Spark-backed properties (merge
  * idempotence, profiler sums) live in the ScalaTest suites. */
object ZValueProps extends Properties("zvalue") {

  /** Reference model: interleave via string bit manipulation. */
  private def model(bits: Int, xs: Seq[Long]): Long = {
    val n = xs.size
    var z = 0L
    for (ci <- 0 until n; b <- 0 until bits)
      z |= ((xs(ci) >> b) & 1L) << (b * n + (n - 1 - ci))
    z
  }

  private val small = Gen.chooseNum(0L, 255L)

  property("2-col interleave matches bit model") = forAll(small, small) { (x, y) =>
    model(8, Seq(x, y)) == {
      // closed form for 2 cols: x bits at odd positions, y at even
      (0 until 8).map(b => (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b)))
        .reduce(_ | _)
    }
  }

  property("z-value is monotone in each coordinate prefix") = forAll(small, small) { (x, y) =>
    // flipping a higher input bit can only increase the z-value when all
    // higher interleaved bits are zero — weak but useful ordering sanity
    model(8, Seq(x, 0L)) <= model(8, Seq(x, 255L))
  }

  property("distinct inputs give distinct z-values (injective within range)") =
    forAll(small, small, small, small) { (a, b, c, d) =>
      (a == c && b == d) == (model(8, Seq(a, b)) == model(8, Seq(c, d)))
    }

  property("salted two-phase count equals direct count (model)") =
    forAll(Gen.listOf(Gen.chooseNum(0, 2))) { keys =>
      val direct = keys.groupBy(identity).view.mapValues(_.size).toMap
      val salted = keys.zipWithIndex
        .groupBy { case (k, i) => (k, i % 16) }
        .view.mapValues(_.size).toMap
        .groupBy { case ((k, _), _) => k }
        .view.mapValues(_.values.sum).toMap
      direct == salted
    }
}

/** Properties of the r9 adaptive-salting and two-phase-rank kernels at
  * their boundaries (round-9 verdict item 7): saltsOf at the 64-salt
  * clamp, salt-join pair-multiset preservation for ANY block size, and
  * the Ranks offset math under duplicate-order-key runs spanning
  * partitions — all on pure driver-side models of the distributed
  * kernels (the Spark-backed equivalence lives in RanksSpec /
  * Wave56Spec). */
object SaltAndRankProps extends Properties("salt-rank") {

  import graft.ops.Wave56.{saltsOf, LinkMaxSalts}

  private val anyRows = Gen.chooseNum(0L, Long.MaxValue)
  private val cap = Gen.chooseNum(1L, 1000000L)

  property("saltsOf stays in [1, LinkMaxSalts] for every (rows, cap)") =
    forAll(anyRows, cap) { (n, c) =>
      val ns = saltsOf(n, c)
      ns >= 1 && ns <= LinkMaxSalts
    }

  property("saltsOf = ceil(n/cap) below the clamp, exactly LinkMaxSalts past it") =
    forAll(Gen.chooseNum(0L, 10000L), Gen.chooseNum(1L, 100L)) { (n, c) =>
      val exact = if (n == 0) 1L else (n + c - 1) / c
      saltsOf(n, c) == math.min(LinkMaxSalts.toLong, math.max(1L, exact)).toInt
    }

  property("salted block join meets each (clean, dirty) pair exactly once") =
    forAll(Gen.chooseNum(1, 300), Gen.chooseNum(1L, 50L)) { (n, c) =>
      val ns = saltsOf(n.toLong, c)
      // clean row k carries salt k mod ns; dirty row d is replicated to
      // every salt 0..ns-1; the join keeps (k, d, salt) with matching
      // salts — the pair multiset must equal the unsalted block join's
      val pairs = for {
        k <- 0 until n; d <- 0 until n
        salt <- 0 until ns if k % ns == salt
      } yield (k, d)
      pairs.size == n * n && pairs.distinct.size == n * n
    }

  /** Driver-side model of Ranks.twoPhase's offset math: rows land in
    * range partitions (any contiguous split — duplicate order keys MAY
    * straddle a boundary), each partition reports its per-group count,
    * and rank = prefix offset + local row_number. Must equal the global
    * rank for every split. */
  property("two-phase rank offsets survive any contiguous split, incl. tie runs") =
    forAll(Gen.listOf(Gen.chooseNum(0, 5)), Gen.chooseNum(1, 7)) { (keys, parts) =>
      val rows = keys.zipWithIndex // (orderKey, uniqueTiebreak)
        .sortBy { case (k, i) => (k, i) }
      val global = rows.zipWithIndex.map { case (r, i) => r -> (i + 1) }.toMap
      // contiguous split into `parts` chunks (ties straddle freely)
      val chunks = if (rows.isEmpty) Seq.empty
        else rows.grouped(math.max(1, (rows.size + parts - 1) / parts)).toSeq
      val offsets = chunks.scanLeft(0L)(_ + _.size)
      chunks.zipWithIndex.forall { case (chunk, pi) =>
        chunk.zipWithIndex.forall { case (r, li) =>
          offsets(pi) + li + 1 == global(r)
        }
      }
    }
}

/** Properties of the native aggregate buffers (SimhashAgg / VecSumAgg):
  * update/merge must form a commutative monoid over any partitioning of
  * the input — the contract partial aggregation (map-side combine)
  * depends on. Modeled on the pure buffer ops, mirroring the
  * TypedImperativeAggregate implementations bit for bit. */
object NativeAggProps extends Properties("native-agg") {

  // SimhashAgg model
  private def shUpdate(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) { buf(i) += (h >>> i) & 1L; i += 1 }
    buf(64) += 1L; buf
  }
  private def shMerge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }
  private def shEval(buf: Array[Long]): Long = {
    var z = 0L; var i = 0
    while (i < 64) { if (2L * buf(i) > buf(64)) z |= 1L << i; i += 1 }
    z
  }
  private def shOf(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(new Array[Long](65))(shUpdate)

  property("simhash: any split-merge equals single-pass") =
    forAll(Gen.listOf(Gen.long), Gen.chooseNum(0, 10)) { (hs, cut0) =>
      val cut = if (hs.isEmpty) 0 else cut0 % (hs.size + 1)
      val (l, r) = hs.splitAt(cut)
      shEval(shMerge(shOf(l), shOf(r))) == shEval(shOf(hs))
    }

  property("simhash: merge is commutative") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (a, b) =>
      shEval(shMerge(shOf(a), shOf(b))) == shEval(shMerge(shOf(b), shOf(a)))
    }

  // VecSumAgg model
  private def vsMerge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else a.zip(b).map { case (x, y) => x + y }

  property("vecsum: empty buffer is the identity") =
    forAll(Gen.listOfN(4, Gen.chooseNum(-1e6f, 1e6f))) { v =>
      val buf = v.map(_.toDouble).toArray
      vsMerge(buf, Array.empty).sameElements(buf) &&
        vsMerge(Array.empty, buf).sameElements(buf)
    }

  property("vecsum: merge of singletons equals elementwise sum") =
    forAll(Gen.listOfN(4, Gen.chooseNum(-1e3f, 1e3f)),
      Gen.listOfN(4, Gen.chooseNum(-1e3f, 1e3f))) { (x, y) =>
      val m = vsMerge(x.map(_.toDouble).toArray, y.map(_.toDouble).toArray)
      m.zip(x.zip(y)).forall { case (s, (a, b)) => s == a.toDouble + b.toDouble }
    }
}

/** TopKCountAgg model: bounded insert/merge must equal sort-take-k under
  * the (count desc, value asc nulls-first, unsigned-bytes) order, over
  * any split of the input — the exactness claim behind replacing the
  * window sort. */
object TopKProps extends Properties("topk-agg") {

  private type E = (Option[String], Long)

  private def lt(a: E, b: E): Boolean = {
    if (a._2 != b._2) return a._2 > b._2
    (a._1, b._1) match {
      case (None, None) => false
      case (None, _) => true
      case (_, None) => false
      case (Some(x), Some(y)) =>
        val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
        val n = math.min(xb.length, yb.length)
        var i = 0
        while (i < n) {
          if ((xb(i) & 0xFF) != (yb(i) & 0xFF)) return (xb(i) & 0xFF) < (yb(i) & 0xFF)
          i += 1
        }
        xb.length < yb.length
    }
  }

  private def model(es: Seq[E], k: Int): Seq[E] = es.sortWith(lt).take(k)

  private def heapInsert(buf: Vector[E], e: E, k: Int): Vector[E] = {
    val i = buf.indexWhere(!lt(_, e)) match { case -1 => buf.length; case x => x }
    (buf.take(i) :+ e) ++ buf.drop(i) take k
  }

  private val entry: Gen[E] = for {
    v <- Gen.option(Gen.oneOf("a", "b", "ab", "", "é", "z", "aa"))
    c <- Gen.chooseNum(0L, 5L)
  } yield (v, c)

  property("bounded insert over any split equals sort-take-k") =
    forAll(Gen.listOf(entry), Gen.chooseNum(1, 4), Gen.chooseNum(0, 20)) { (es, k, cut0) =>
      val cut = if (es.isEmpty) 0 else cut0 % (es.size + 1)
      val (l, r) = es.splitAt(cut)
      val lBuf = l.foldLeft(Vector.empty[E])(heapInsert(_, _, k))
      val rBuf = r.foldLeft(Vector.empty[E])(heapInsert(_, _, k))
      val merged = rBuf.foldLeft(lBuf)(heapInsert(_, _, k))
      merged == model(es, k)
    }
}

/** Pure reference model of the chunk_stride 64/48 geometry (Wave4): the
  * chunk-count formula, full token coverage, and the 16-token overlap
  * accounting that Wave4Spec asserts on fixture data must hold for EVERY
  * length, including the formula's seams (0, 64, 65, 112, 113). */
object ChunkStrideProps extends Properties("chunk-stride") {
  private val W = 64; private val S = 48

  private def nChunks(len: Int): Int =
    if (len <= W) 1 else (len - 17) / S + 1   // == ceil((len-64)/48)+1

  /** Chunk i covers token positions [i*S+1, min(i*S+W, len)]. */
  private def chunkSizes(len: Int): Seq[Int] =
    (0 until nChunks(len)).map(i => math.max(0, math.min(i * S + W, len) - i * S))

  private val lens = Gen.frequency(
    4 -> Gen.chooseNum(0, 400),
    1 -> Gen.oneOf(0, 1, 63, 64, 65, 111, 112, 113, 160, 161))

  property("every token is covered and the last chunk reaches len") =
    forAll(lens) { len =>
      val n = nChunks(len)
      // consecutive chunk starts are S apart with W >= S: no gaps; and the
      // last chunk's reach (n-1)*S + W must cover the final token
      len == 0 || (n - 1) * S + W >= len && (n - 1) * S + 1 <= len
    }

  property("total chunked tokens = len + 16 per extra chunk") =
    forAll(lens) { len =>
      chunkSizes(len).sum == len + (nChunks(len) - 1) * (W - S)
    }

  property("all chunks before the last are full") =
    forAll(lens) { len =>
      chunkSizes(len).dropRight(1).forall(_ == W)
    }
}

/** The packed-count invariant behind profile_ks's single prefix pass:
  * both half-counts ride one 64-bit word (n1·2^32 + n2) through the sum
  * aggregate, and the halves decode exactly as long as each TOTAL stays
  * below 2^32 — addition never carries across the split, so ONE
  * two-phase prefix sum yields both cumulative ECDFs. */
object KsPackProps extends Properties("kspack") {
  private val B = 4294967296L // 2^32
  private val half = Gen.chooseNum(0L, (1L << 31) - 1)

  property("pack/unpack roundtrip") = forAll(half, half) { (n1, n2) =>
    val pk = n1 * B + n2
    Math.floorDiv(pk, B) == n1 && Math.floorMod(pk, B) == n2
  }

  property("componentwise sums are carry-free below the 2^32 halves bound") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 1000L)))) { xs =>
      val s = xs.map { case (a, b) => a * B + b }.sum
      Math.floorDiv(s, B) == xs.map(_._1).sum && Math.floorMod(s, B) == xs.map(_._2).sum
    }
}

/** The lossless-codec identity the multimodal_decode_image oracle rests
  * on: for ANY doc id, encoding the md5-formula pixels to PNG and
  * decoding with the real ImageIO codec returns exactly the formula
  * pixels — so the DuckDB oracle may replay features from the formula
  * while the engine actually decodes. */
object PngRoundtripProps extends Properties("png-roundtrip") {
  import org.scalacheck.Prop

  property("ImageIO PNG roundtrip is pixel-exact for any doc id") =
    forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { docId =>
      val png = graft.ops.Multimodal.syntheticPng(docId)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val md = java.security.MessageDigest.getInstance("MD5")
      Prop.all(
        (0 until graft.ops.Multimodal.ImgH).flatMap { y =>
          (0 until graft.ops.Multimodal.ImgW).map { x =>
            val (r, g, b) = graft.ops.Multimodal.pixelValue(md, docId, x, y)
            val rgb = img.getRGB(x, y)
            Prop(((rgb >> 16) & 255) == r && ((rgb >> 8) & 255) == g &&
              (rgb & 255) == b) :| s"pixel ($x,$y)"
          }
        }: _*)
    }
}
