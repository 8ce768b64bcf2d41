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

  test("mixture rebalance: rates derived from char mass, min source kept whole") {
    import org.apache.spark.sql.functions.{col, sum => sqlSum}
    val docs = Tables.documents(spark, sf)
    val mass = docs.groupBy("source")
      .agg(sqlSum(col("n_chars")).as("sc"))
      .as[(String, Long)].collect().toMap
    val counts = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val mn = mass.values.min
    val kept = Curation.sampleMixtureBalanced(spark, sf)
    val rates = kept.select("source", "rate_pm").distinct()
      .as[(String, Long)].collect().toMap
    rates.foreach { case (s, r) =>
      assert(r > 0 && r <= 1000, s"$s rate $r out of range")
      assert(r == mn * 1000 / mass(s), s"$s rate mismatch")
    }
    // Non-vacuous: heavier sources must get a rate strictly below 1000.
    assert(rates.values.exists(_ < 1000), "all rates 1000 — gate vacuous")
    val keptCounts = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // Every minimum-mass source has rate 1000 → keeps all its docs.
    mass.filter(_._2 == mn).keys.foreach { s =>
      assert(keptCounts.getOrElse(s, 0L) == counts(s), s"min source $s not whole")
    }
    keptCounts.foreach { case (s, k) =>
      assert(k <= counts(s), s"$s kept more than it had")
    }
  }

  test("temperature sampling compresses rates between balanced and unity") {
    val bal = Curation.sampleMixtureBalanced(spark, sf)
      .select("source", "rate_pm").distinct()
      .as[(String, Long)].collect().toMap
    val temp = Curation.sampleMixtureTemperature(spark, sf)
      .select("source", "rate_pm").distinct()
      .as[(String, Long)].collect().toMap
    assert(temp.nonEmpty)
    // α = 1/2 sits strictly between balanced (α = 0) and raw (α = 1):
    // every source's tempered rate is >= its balanced rate and <= 1000,
    // and the lightest source still keeps everything.
    temp.foreach { case (s, r) =>
      assert(r <= 1000L, s"$s rate $r above unity")
      bal.get(s).foreach(b => assert(r >= b, s"$s tempered $r < balanced $b"))
    }
    assert(temp.values.max == 1000L, "lightest source must keep all docs")
    // Direct recompute of the rate formula for one source.
    val mass = graft.Tables.documents(spark, sf)
      .groupBy("source").agg(sum("n_chars").as("sc"))
      .as[(String, Long)].collect().toMap
    val mn = mass.values.min
    mass.foreach { case (s, m) =>
      val want = math.floor(math.sqrt(mn.toDouble)).toLong * 1000L /
        math.floor(math.sqrt(m.toDouble)).toLong
      temp.get(s).foreach(r => assert(r == want, s"$s rate $r != $want"))
    }
  }

  test("source report reconciles with its component stages") {
    val rep = Curation.sourceReport(spark, sf).cache()
    try {
      val docs = graft.Tables.documents(spark, sf)
      // Volume legs reconcile exactly with the raw table.
      assert(rep.agg(sum(col("n_docs"))).as[Long].head() == docs.count())
      assert(rep.agg(sum(col("n_chars"))).as[Long].head() ==
        docs.agg(sum(col("n_chars"))).as[Long].head())
      // Keeper leg: per-source counts sum to the global keeper count
      // (keepers partition across sources), and no source over-claims.
      val keepers = Dedup.fingerprintDedup(spark, sf).count()
      assert(rep.agg(sum(col("n_keepers"))).as[Long].head() == keepers)
      assert(rep.filter(col("n_keepers") > col("n_docs")).count() == 0)
      assert(rep.filter(col("n_dup_extra") =!=
        col("n_docs") - col("n_keepers")).count() == 0)
      // Quality leg: one source's row recomputed directly.
      val srcQ = TextAnalysis.textQuality(spark, sf)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .filter(col("source") === "src3")
        .select(floor(col("quality_score") * 1000).cast("long").as("q_pm"))
        .agg(count(when(col("q_pm") >= 500, 1)).as("nk"),
          sum(col("q_pm")).as("mass"), count(lit(1)).as("n"))
        .as[(Long, Long, Long)].head()
      val row3 = rep.filter(col("source") === "src3")
        .select("n_quality_keep", "mean_q_permille").as[(Long, Long)].head()
      assert(row3._1 == srcQ._1)
      assert(row3._2 == srcQ._2 / srcQ._3)
      // Bounds: permille means in range, boilerplate leg counts the
      // planted carriers (>= the planted density per source).
      assert(rep.filter(col("mean_q_permille") < 0 ||
        col("mean_q_permille") > 1000).count() == 0)
      assert(rep.filter(col("n_bp_docs") === 0).count() == 0,
        "a source lost its planted boilerplate carriers")
    } finally rep.unpersist()
  }
}
