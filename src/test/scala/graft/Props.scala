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
