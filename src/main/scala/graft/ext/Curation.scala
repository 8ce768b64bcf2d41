package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** End-to-end corpus-curation operators — the composition layer a
  * training-data pipeline actually ships: quality gate + near-dup
  * survivor selection in one pass, and deterministic stratified sampling.
  *
  * Scale notes: curation is a semi-join of the (embarrassingly parallel)
  * per-doc quality scores against the fingerprint-survivor set — one
  * shuffle on the fingerprint hash, one on doc_id. Sampling is pure
  * map-side (hash-threshold per row, no shuffle, no RNG state — rerunnable
  * and exactly reproducible across engines and retries, unlike
  * `DataFrame.sample`, which is seed+partitioning dependent).
  */
object Curation {

  /** Survivors: min doc_id per normalized-text fingerprint (the keeper
    * rule of Dedup.fingerprintDedup) that also clear the quality gate. */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = TextAnalysis.textQuality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    val keepers = Dedup.fingerprintDedup(spark, sfDir)
      .select(col("keeper").as("doc_id"))
    quality
      .filter(col("quality_score") >= 0.5)
      .join(keepers, Seq("doc_id"), "left_semi")
  }

  val curateSql: String =
    s"""SELECT doc_id, quality_score FROM (${TextAnalysis.textQualitySql})
       |WHERE quality_score >= 0.5 AND doc_id IN (
       |  SELECT MIN(doc_id) FROM documents
       |  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g')))""".stripMargin

  /** Per-language sampling rates (percent kept). */
  val rates: Seq[(String, Int)] =
    Seq("en" -> 50, "de" -> 25, "es" -> 25, "fr" -> 25, "zh" -> 10)

  private def rateCol: org.apache.spark.sql.Column =
    rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }

  /** Deterministic stratified sample: keep a doc iff
    * polyHash(lang:doc_id) mod 100 < rate(lang). Map-side only. */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        GraftFunctions.polyHash(
          concat_ws(":", col("lang"), col("doc_id").cast("string"))) % 100)
      .filter(col("bucket") < rateCol.cast("long"))
      .select(col("doc_id"), col("lang"), col("bucket"))

  val sampleStratifiedSql: String = {
    val rateSql = rates.foldRight("0") { case ((l, r), acc) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    val h = Hashing.stringHashSql("lang || ':' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, lang, ($h) % 100 AS bucket
       |FROM documents
       |WHERE ($h) % 100 < $rateSql""".stripMargin
  }

  /** Per-source corpus mixture report — the audit a training-data mix
    * is planned from: docs, exact char mass, distinct languages, and
    * each source's share of the corpus by chars. One groupBy on source
    * plus a 1-row broadcast total; shares are one double divide of two
    * exact Longs, so the report is deterministic at any partitioning. */
  def sourceMixture(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
    val total = perSource.agg(sum(col("sum_chars")).as("total_chars"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("sum_chars"), col("n_langs"),
        (col("sum_chars").cast("double") / col("total_chars").cast("double"))
          .as("char_share"))
  }

  val sourceMixtureSql: String =
    """WITH per_source AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs, sum_chars, n_langs,
      |  CAST(sum_chars AS DOUBLE) /
      |    CAST((SELECT CAST(SUM(sum_chars) AS BIGINT) FROM per_source) AS DOUBLE)
      |    AS char_share
      |FROM per_source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_curate" -> (curate _),
    "sample_stratified" -> (sampleStratified _),
    "source_mixture" -> (sourceMixture _))

  val oracles: Map[String, String] = Map(
    "corpus_curate" -> curateSql,
    "sample_stratified" -> sampleStratifiedSql,
    "source_mixture" -> sourceMixtureSql)
}
