package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DedupBounded}

/** The bounded reporting tiers (round-16): planted mega-cluster
  * families prove the caps ENGAGE (output and intermediates stay
  * bounded where the compliance tier is quadratic) and that below the
  * caps the bounded tier equals the full tier exactly. */
class DedupBoundedSpec extends SparkSpec {
  import spark.implicits._

  private def sigFrame(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("doc_id", "simhash")

  private def degHistOfPairs(pairs: DataFrame): Map[Long, Long] =
    pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hamming hist: a 100-doc mega-bucket is capped at BucketCap members") {
    // All 100 docs share ONE signature: every band bucket holds all
    // 100, so the uncapped graph is K_100 (degree 99 everywhere) —
    // the quadratic shape that killed the sf30h compliance gates. The
    // capped tier keeps the same 32 docs per band (same (idHash,
    // doc_id) order in all 4 bands), i.e. K_32: 32 docs of degree 31,
    // the other 68 unreported.
    val sig = sigFrame((0L until 100L).map(i => (i, 12345L)))
    val hist = DedupBounded.hammingDegreeHistOf(sig)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(31L -> 32L), hist)
    // The compliance tier on the same frame really is K_100.
    val full = degHistOfPairs(Dedup.hammingPairsOf(sig))
    assert(full == Map(99L -> 100L), full)
  }

  test("hamming hist: below the cap, bounded == full tier exactly") {
    // Two clusters, 10 and 5 docs, signatures > 3 bits apart (0 vs
    // 0xFF = 8 bits): no cross-cluster pairs, all buckets under the
    // 32 cap, so capping must be a no-op.
    val sig = sigFrame((0L until 10L).map(i => (i, 0L)) ++
      (100L until 105L).map(i => (i, 255L)))
    val capped = DedupBounded.hammingDegreeHistOf(sig)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == degHistOfPairs(Dedup.hammingPairsOf(sig)))
    assert(capped == Map(9L -> 10L, 4L -> 5L), capped)
  }

  private def shFrame(rows: Seq[(Long, Seq[Long])]): DataFrame =
    rows.map { case (id, sh) => (id, sh.sorted.distinct.toArray) }
      .toDF("doc_id", "sh")

  /** One 10-token doc pasted inside `n` 11-token containers — every
    * container holds all of doc 0, and containers mutually contain
    * each other at 10/11 = 909‰ ≥ τ: a fully saturated family. */
  private def containedFamily(n: Int): DataFrame =
    shFrame((0L, (1L to 10L)) +:
      (1 to n).map(i => (i.toLong, (1L to 10L) :+ (1000L + i))))

  test("containment topk: report is ≤ K rows per doc and caps bound the candidates") {
    val sh = containedFamily(200)
    val pairs = DedupBounded.containmentCappedPairsOf(sh).localCheckpoint()
    // The posting cap bounds candidates and the signature shortlist
    // bounds what reaches the exact verify: doc 0's verified containers
    // are ≤ ShortlistC where the compliance tier reports all 200.
    val aPairs = pairs.filter(col("doc_a") === 0L).count()
    assert(aPairs > 0 && aPairs <= DedupBounded.ShortlistC, aPairs)
    val fullA = Dedup.containmentOf(sh, 900L).filter(col("doc_a") === 0L).count()
    assert(fullA == 200L, fullA)
    // The report never exceeds K rows per contained doc, and doc 0's
    // rows are full containment (1000‰), strongest-first.
    val top = DedupBounded.containmentTopKOf(pairs).localCheckpoint()
    val perDoc = top.groupBy(col("doc_a")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(perDoc <= DedupBounded.ReportTopK, perDoc)
    val aRows = top.filter(col("doc_a") === 0L)
      .orderBy(col("doc_b")).collect()
    assert(aRows.length == DedupBounded.ReportTopK)
    assert(aRows.forall(_.getAs[Long]("cont_permille") == 1000L))
  }

  test("containment topk: below the caps, capped pairs == full tier exactly") {
    val sh = containedFamily(5) // 6 docs, every posting under the cap
    val capped = DedupBounded.containmentCappedPairsOf(sh)
      .collect().map(_.toString).toSet
    val full = Dedup.containmentOf(sh, 900L)
      .collect().map(_.toString).toSet
    assert(capped == full)
    assert(capped.nonEmpty)
  }
}
