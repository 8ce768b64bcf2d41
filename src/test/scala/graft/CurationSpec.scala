package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, TextAnalysis}

/** Curation semantics beyond the oracle gate: the curate set is exactly
  * (quality gate ∩ fingerprint keepers), and stratified sampling hits
  * its per-language rates within binomial tolerance while being exactly
  * rerun-stable. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate == quality-gated intersection with fingerprint keepers") {
    val curated = Curation.curate(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val quality = TextAnalysis.textQuality(spark, sf)
      .filter(col("quality_score") >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    val keepers = Dedup.fingerprintDedup(spark, sf)
      .select("keeper").as[Long].collect().toSet
    assert(curated == quality.intersect(keepers))
    assert(curated.nonEmpty)
  }

  test("stratified sample: rerun-stable, rates within tolerance") {
    val s1 = Curation.sampleStratified(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Curation.sampleStratified(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "hash-threshold sampling must be exactly rerunnable")

    val perLang = Curation.sampleStratified(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = Tables.documents(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    Curation.rates.foreach { case (lang, pct) =>
      val n = totals.getOrElse(lang, 0L)
      if (n >= 50) {
        val got = perLang.getOrElse(lang, 0L).toDouble / n
        val want = pct / 100.0
        // 4-sigma binomial tolerance on n draws.
        val tol = 4 * math.sqrt(want * (1 - want) / n)
        assert(math.abs(got - want) <= tol,
          s"$lang: got $got want $want ±$tol over $n docs")
      }
    }
  }
}
