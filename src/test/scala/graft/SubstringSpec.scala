package graft

import org.apache.spark.sql.functions._

import graft.ext.{Hashing, Substring}
import graft.functions.{GraftFunctions => GF}

/** Substring-span dedup: the native positional span kernel equals the
  * HOF formulation the oracle states, planted shared spans are found,
  * and the corpus gate is non-vacuous. */
class SubstringSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GF.register(spark) // planted frames don't pass through Tables
  }

  test("spanHashes kernel == HOF fold (order + multiplicity)") {
    // Includes a doc with a repeated span ("a b c d e" twice) — the
    // set-semantic shingle kernel would collapse it; the span kernel
    // must not.
    val docs = Seq(
      "a b c d e x y a b c d e",
      "one two three four five",
      "tiny doc",
      "").toDF("text")
    val k = 5
    val hof = when(size(col("whs")) >= k,
      transform(sequence(lit(0), size(col("whs")) - k),
        i => aggregate(slice(col("whs"), i + 1, lit(k)), lit(0L),
          (acc, x) => (acc * 1000003 + x) % Hashing.P)))
      .otherwise(array().cast("array<bigint>"))
    val bad = docs
      .select(GF.wordHashes(col("text")).as("whs"))
      .select(GF.spanHashes(col("whs"), k).as("a"), hof.as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad == 0)
  }

  test("planted shared span is detected with exact counts") {
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared zeta eta theta iota kappa"),
      (2L, s"prefix words here $shared trailing bit"),
      (3L, s"unrelated content entirely different words junk fill pad")
    ).toDF("doc_id", "text")
    val sp = docs.select(col("doc_id"),
      explode(Hashing.spanHashes(Hashing.wordHashes(col("text")), 5)).as("h"))
    val dup = sp.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .collect()
    // Exactly one 5-span is shared between docs 1 and 2.
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("n_docs") == 2)
    assert(dup.head.getAs[Long]("n_occ") == 2)
  }

  test("corpus gate is non-vacuous and coverage is consistent") {
    val spans = Substring.duplicatedSpans(spark, sf)
    assert(spans.count() > 0, "no duplicated spans on the corpus")
    val cov = Substring.spanCoverage(spark, sf)
    val bad = cov.filter(col("n_dup_spans") > col("n_spans") ||
      col("n_dup_spans") < 0 ||
      col("dup_span_frac") < 0 || col("dup_span_frac") > 1).count()
    assert(bad == 0)
    // Total duplicated occurrences must reconcile across the two views.
    val occ = spans.agg(sum(col("n_occ"))).as[Long].head()
    val docSum = cov.agg(sum(col("n_dup_spans"))).as[Long].head()
    assert(occ == docSum,
      s"span-table occurrences $occ != per-doc dup-span sum $docSum")
  }
}
