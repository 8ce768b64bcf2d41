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

  /** `n` near-identical docs: 10 shared tokens plus one private token
    * each — every pair intersects 10 of 11, J = 10/12 = 833‰ ≥ τ=800,
    * and all docs share the same 3 rarest... actually all tokens have
    * df=n except the private ones (df=1), so each doc's prefix is its
    * private token + the 2 smallest shared hashes — private tokens
    * never collide, the SHARED prefix tokens carry the mega postings
    * the cap must bound. */
  private def jacFamily(n: Int): DataFrame =
    shFrame((1 to n).map(i => (i.toLong, (1L to 10L) :+ (1000L + i))))

  test("jaccard topk: mega-cluster postings capped, report ≤ K per doc") {
    val sh = jacFamily(150)
    val top = DedupBounded.jaccardTopKOf(sh).localCheckpoint()
    // Per-doc report bounded by K.
    val perDoc = top.groupBy(col("doc_a")).agg(count(lit(1)).as("n"))
    assert(perDoc.agg(max(col("n"))).collect()(0).getLong(0)
      <= DedupBounded.ReportTopK)
    // Only capped-posting members generate pairs as doc_a < doc_b
    // seeds, but mirroring still reports both sides of each pair;
    // total rows are far under the full tier's n·(n−1) mirrored pairs.
    val rows = top.count()
    assert(rows > 0 && rows <= 150L * DedupBounded.ReportTopK, rows)
    val full = Dedup.jaccardPrefixOf(sh, 800L).count()
    assert(full == 150L * 149L / 2, full)
    // Every reported pair is a real ≥τ pair with the exact stats.
    val bad = top.filter(col("jac_permille") =!= lit(833L)).count()
    assert(bad == 0, s"unexpected jaccard values: $bad rows")
  }

  test("jaccard topk: below the caps, report == full tier's per-doc top-K") {
    // Two clusters (3 + 2 docs), every posting under the cap, every
    // doc with ≤ K qualifying partners: the bounded report must equal
    // the full tier's pair set, mirrored.
    val sh = shFrame(Seq(
      (1L, (1L to 10L)), (2L, (1L to 9L) :+ 20L), (3L, (1L to 9L) :+ 21L),
      (10L, (100L to 109L)), (11L, (100L to 108L) :+ 120L)))
    val top = DedupBounded.jaccardTopKOf(sh)
      .select("doc_a", "doc_b", "inter", "uni", "jac_permille")
      .collect().map(_.toString).toSet
    val p = Dedup.jaccardPrefixOf(sh, 800L)
    val mirrored = p.unionAll(p.select(col("doc_b"), col("doc_a"),
        col("inter"), col("uni"), col("jac_permille")))
      .select("doc_a", "doc_b", "inter", "uni", "jac_permille")
      .collect().map(_.toString).toSet
    assert(top == mirrored)
    assert(top.size == 8, top.size) // 3-cluster: 6 directed; 2-cluster: 2
  }

  test("phash hist: mega-family capped; below the cap == full tier") {
    // 80 identical phashes: every band bucket holds all 80 — the
    // sf30-uniform replica shape. Capped graph is K_32.
    val mega = sigFrame((0L until 80L).map(i => (i, 0x155555555L)))
      .withColumnRenamed("simhash", "phash")
    val hist = ext.Multimodal.phashDegreeHistOf(mega)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(31L -> 32L), hist)
    val full = degHistOfPairs(ext.Multimodal.phashPairs(mega))
    assert(full == Map(79L -> 80L), full)
    // Below the cap (two families of 6 and 4, far apart in every
    // band), capped degree histogram == uncapped.
    val small = sigFrame((0L until 6L).map(i => (i, 0L)) ++
      (100L until 104L).map(i => (i, 0x7FFFFFFFFFFFFFFL)))
      .withColumnRenamed("simhash", "phash")
    val capped = ext.Multimodal.phashDegreeHistOf(small)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == degHistOfPairs(ext.Multimodal.phashPairs(small)))
    assert(capped == Map(5L -> 6L, 3L -> 4L), capped)
  }

  test("incremental containment topk: split sides, caps engage, report ≤ K") {
    // One arriving doc contained in 200 snapshot containers. The old
    // side's postings are capped, the shortlist bounds the verify, the
    // report keeps the K strongest (all 1000‰, ties by doc_b asc).
    val newSh = shFrame(Seq((0L, (1L to 10L))))
    val oldSh = shFrame((1 to 200).map(i =>
      (i.toLong, (1L to 10L) :+ (1000L + i))))
    val all = newSh.unionAll(oldSh)
    val pairs = DedupBounded.containmentCappedPairsSides(newSh, oldSh, all)
      .localCheckpoint()
    // Direction discipline: doc_a is always the arriving side.
    assert(pairs.filter(col("doc_a") =!= 0L).count() == 0)
    val nPairs = pairs.count()
    assert(nPairs > 0 && nPairs <= DedupBounded.ShortlistC, nPairs)
    val top = DedupBounded.containmentTopKOf(pairs).orderBy(col("doc_b"))
      .collect()
    assert(top.length == DedupBounded.ReportTopK)
    assert(top.forall(_.getAs[Long]("cont_permille") == 1000L))
  }
}
