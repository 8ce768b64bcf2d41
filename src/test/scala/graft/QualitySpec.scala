package graft

import org.apache.spark.sql.functions._

import graft.ext.Quality

/** Gopher-style repetition/rule filters: planted documents prove the
  * signals move the right way, and the corpus-level gate is pinned
  * non-vacuous (both keep classes present). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  // 40 distinct words of length 4-5 → passes every rule.
  private val cleanText = (0 until 40)
    .map(i => if (i % 2 == 0) s"wrd${('a' + i / 2).toChar}" else s"word${('a' + i / 2).toChar}")
    .mkString(" ")
  // One word repeated 40 times → top_share = 1, dup_token_frac = 39/40.
  private val spamText = Seq.fill(40)("spam").mkString(" ")
  // Alternating pair → every 2-gram is one of two values.
  private val loopText = Seq.fill(20)("ping pong").mkString(" ")

  private lazy val planted = Seq(
    (1L, cleanText), (2L, spamText), (3L, loopText),
    (4L, "solo"), (5L, ""))
    .toDF("doc_id", "text")

  private lazy val stats = Quality.statsOf(planted)

  test("repetition signals on planted docs") {
    val r = stats.collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    val clean = r(1L); val spam = r(2L); val loop = r(3L)

    assert(clean.getAs[Long]("n_tokens") == 40)
    assert(clean.getAs[Long]("n_distinct") == 40)
    assert(clean.getAs[Long]("top_tf") == 1)

    assert(spam.getAs[Long]("n_tokens") == 40)
    assert(spam.getAs[Long]("n_distinct") == 1)
    assert(spam.getAs[Long]("top_tf") == 40)
    // all 39 2-grams identical
    assert(spam.getAs[Long]("n_2grams") == 39)
    assert(spam.getAs[Long]("n_distinct_2g") == 1)

    // "ping pong ping pong ..." — 39 2-grams, only 2 distinct
    assert(loop.getAs[Long]("n_2grams") == 39)
    assert(loop.getAs[Long]("n_distinct_2g") == 2)
  }

  test("rule flags: clean doc kept, spam and loop dropped") {
    val k = Quality.rulesOf(stats).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(k(1L).getAs[Boolean]("keep"))
    assert(k(1L).getAs[Boolean]("pass_top_share"))
    assert(!k(2L).getAs[Boolean]("pass_top_share"))
    assert(!k(2L).getAs[Boolean]("keep"))
    assert(!k(3L).getAs[Boolean]("pass_dup_2gram"))
    assert(!k(3L).getAs[Boolean]("keep"))
  }

  test("short and empty docs surface with keep=false, not silently dropped") {
    // A 1-token doc has no 2-grams and a 0-token doc no unigrams at all;
    // explode drops their empty arrays, so inner joins used to omit
    // exactly the docs the MinWords rule exists to reject.
    val r = stats.collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.contains(4L) && r.contains(5L), "short/empty docs missing from stats")
    assert(r(4L).getAs[Long]("n_tokens") == 1)
    assert(r(4L).getAs[Long]("n_2grams") == 0)
    assert(r(5L).getAs[Long]("n_tokens") == 0)
    assert(r(5L).getAs[Long]("top_tf") == 0)
    val k = Quality.rulesOf(stats).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!k(4L).getAs[Boolean]("pass_n_words") && !k(4L).getAs[Boolean]("keep"))
    assert(!k(5L).getAs[Boolean]("pass_n_words") && !k(5L).getAs[Boolean]("keep"))
  }

  test("corpus gate is non-vacuous: both keep classes present") {
    val byKeep = Quality.gopherRules(spark, sf)
      .groupBy(col("keep")).count().collect()
      .map(r => r.getAs[Boolean]("keep") -> r.getAs[Long]("count")).toMap
    assert(byKeep.getOrElse(true, 0L) > 0, "no doc passes the rules")
    assert(byKeep.getOrElse(false, 0L) > 0, "no doc fails the rules")
  }

  test("fractions are exact and bounded") {
    val bad = Quality.repetition(spark, sf)
      .filter(col("dup_token_frac") < 0 || col("dup_token_frac") > 1 ||
        col("top_share") <= 0 || col("top_share") > 1 ||
        col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1)
      .count()
    assert(bad == 0)
  }
}
