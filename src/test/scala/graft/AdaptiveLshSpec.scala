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

  test("gated adaptive query: capped dial keeps every query, weakens no rank") {
    // The adaptive gate = explicit dial at the fixture's bits PLUS the
    // strongest-64-per-bucket candidate cap (which BINDS at every
    // fixture SF — occupancy targets 64..128 by construction — so plain
    // equality with the uncapped dial cannot hold; the cross-engine
    // hash gate pins the capped semantics exactly instead). Spec the
    // cap's contracts against the uncapped dial at the same bits
    // (sf0.001: 500 vectors -> bits 2; 8 tables):
    val adaptive = Similarity.knnLshAdaptive(spark, sf)
      .select("vec_a", "vec_b", "rank", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val explicit = Similarity.knnLshWith(spark, sf, 8, 2)
      .select("vec_a", "vec_b", "rank", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(adaptive.nonEmpty)
    // 1. No query vanishes: the cap keeps 64 members per bucket, so
    //    every query that had candidates still has candidates.
    assert(adaptive.map(_._1).toSet == explicit.map(_._1).toSet)
    // 2. Ranks stay a contiguous 1..k prefix per query.
    adaptive.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length), s"q=$q")
    }
    // 3. Dropping candidates can only WEAKEN the best match: adaptive's
    //    top-1 cosine <= uncapped top-1 cosine, per query.
    val expTop = explicit.filter(_._3 == 1L).map(r => r._1 -> r._4).toMap
    adaptive.filter(_._3 == 1L).foreach { case (q, _, _, c) =>
      assert(c <= expTop(q) + 1e-12, s"q=$q capped top-1 beat uncapped")
    }
    // 4. The cap actually engages at this occupancy (125/bucket avg):
    //    some query's neighbor set differs from the uncapped dial.
    assert(adaptive.map(t => (t._1, t._2)).toSet !=
      explicit.map(t => (t._1, t._2)).toSet,
      "cap did not engage — occupancy assumption broken")
  }
}
