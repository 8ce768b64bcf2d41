package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** The adaptive-bits dial: bits = clamp(⌊log₂(n/target)⌋, 2, 16) must be
  * the exact integer the oracle's floor(log2(n // target)) produces —
  * pinned here value-by-value across the fixture SFs and the clamp
  * edges, because a one-bit disagreement silently halves/doubles every
  * bucket and the gate would fail with no hint why. */
class AdaptiveLshSpec extends SparkSpec {

  test("adaptiveBitsFor matches the oracle formula at the fixture sizes") {
    // (n embeddings, expected bits) — target bucket 64:
    //   500  -> 500/64  = 7    -> floor(log2(7))   = 2
    //   2000 -> 2000/64 = 31   -> floor(log2(31))  = 4
    //  20000 -> /64     = 312  -> floor(log2(312)) = 8
    //  60000 -> /64     = 937  -> floor(log2(937)) = 9
    val expected = Seq(500L -> 2, 2000L -> 4, 20000L -> 8, 60000L -> 9)
    for ((n, bits) <- expected)
      assert(Similarity.adaptiveBitsFor(n) == bits, s"n=$n")
  }

  test("clamps: tiny corpora floor at 2 bits, huge ones cap at 16") {
    assert(Similarity.adaptiveBitsFor(1L) == 2)
    assert(Similarity.adaptiveBitsFor(64L) == 2) // 64/64=1, log2=0 -> clamp
    assert(Similarity.adaptiveBitsFor(100_000_000_000L) == 16) // 100 TB scale
  }

  test("exact power-of-two boundaries agree with floor(log2())") {
    // IEEE log2 is exact on powers of two; the integer formula must land
    // on the same side of each boundary as the oracle's floor(log2()).
    for (k <- 2 to 16) {
      val atBoundary = (1L << k) * Similarity.AdaptiveTargetBucket
      assert(Similarity.adaptiveBitsFor(atBoundary) == math.min(k, 16))
      assert(Similarity.adaptiveBitsFor(atBoundary - 1) ==
        math.max(2, math.min(k - 1, 16)))
    }
  }

  test("gated adaptive query == explicit dial at the fixture's bits") {
    import org.apache.spark.sql.functions._
    val adaptive = Similarity.knnLshAdaptive(spark, sf)
      .select("vec_a", "vec_b", "rank").collect().toSet
    // sf0.001 has 500 vectors -> bits 2; 8 tables (the dense dial).
    val explicit = Similarity.knnLshWith(spark, sf, 8, 2)
      .select("vec_a", "vec_b", "rank").collect().toSet
    assert(adaptive == explicit)
    assert(adaptive.nonEmpty)
  }
}
