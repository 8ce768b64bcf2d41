package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** The LSH band-bucket cap (Dedup.BucketCap, the posting-cap pattern):
  * (1) it must NOT bind at the gate SF — capped and uncapped candidate
  * sets identical, so the cap is pure 100 TB insurance there — and
  * (2) it MUST bind on a planted mega-bucket, bounding the quadratic
  * pair blow-up a templated-boilerplate cluster would otherwise cause. */
class CappedBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("cap does not bind at the gate SF: capped == uncapped candidates") {
    val uncapped = Dedup.lshCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    val capped = Dedup.lshCandidatesCapped(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
    assert(uncapped.nonEmpty, "corpus has planted near-dup pairs")
  }

  test("cap engages on a planted mega-bucket and bounds its pairs") {
    val n = 5 * Dedup.BucketCap // one bucket, 5x over the cap
    val mega = (1L to n.toLong).map(i => (i, 0, 12345L))
      .toDF("doc_id", "band", "bh")
      // a second, small bucket must survive untouched
      .unionAll(Seq((1000L, 1, 777L), (1001L, 1, 777L))
        .toDF("doc_id", "band", "bh"))
    val kept = Dedup.cappedBuckets(mega)
    val perBucket = kept.groupBy("band", "bh").count()
      .as[(Int, Long, Long)].collect().map { case (b, _, c) => (b, c) }.toMap
    assert(perBucket(0) == Dedup.BucketCap.toLong,
      s"mega-bucket must be capped at ${Dedup.BucketCap}")
    assert(perBucket(1) == 2L, "small bucket must be untouched")
    // Determinism: the kept set is the first K in (idHash, doc_id) order,
    // so re-running yields the same membership.
    val kept2 = Dedup.cappedBuckets(mega).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet == kept2)
  }
}
