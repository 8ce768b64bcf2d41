package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection + redaction — the scrubbing pass a public-web training
  * corpus runs before anything else sees the text. Three detector
  * classes (email, NANP-style phone, IPv4), each a plain regular
  * expression valid in BOTH engines' regex dialects (no lookaround, no
  * backreferences — the subset Java regex and RE2 agree on), applied as
  * a fixed replace chain email → phone → ip.
  *
  * The synthetic corpus contains no PII, so the gate PLANTS it
  * deterministically from doc_id (the dedup_phash value-noise-twin
  * pattern): both engines derive the same augmented text, redact with
  * the same chain, and compare match counts + a polyHash of the
  * redacted text — a detector or replacement divergence of a single
  * byte hash-mismatches. Docs with doc_id ∤ 3,5,7 stay clean, so the
  * gate also proves the detectors DON'T fire on ordinary prose.
  *
  * Scale shape: redaction is per-row regex map work — no shuffle, no
  * state, embarrassingly parallel, and codegen keeps the chain inside
  * one WholeStageCodegen span. The summary rollup is a 3-row agg.
  */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Deterministic plants: ~1/3 of docs get an email, ~1/5 a phone,
    * ~1/7 an IPv4 (overlapping — some docs carry all three). */
  private def augmented(docs: DataFrame): DataFrame =
    docs.withColumn("aug", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex-"), (col("doc_id") % 7).cast("string"),
          lit(".org"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" tel 415-555-01"), (col("doc_id") % 10).cast("string"),
          ((col("doc_id") + 3) % 10).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") * 3) % 256).cast("string")))
        .otherwise(lit(""))))

  private def redactChain(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-doc detection counts + redacted-content fingerprint. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    augmented(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_count(col("aug"), lit(Ipv4Re)).cast("long").as("n_ips"),
        length(redactChain(col("aug"))).cast("long").as("red_len"),
        Hashing.stringHash(redactChain(col("aug"))).as("red_hash"))

  /** Corpus-level audit: per detector class, docs hit + total matches.
    * ONE corpus scan: all six measures aggregate together, then the
    * 1-row frame unpivots to the 3-row report (three separate aggs
    * would re-run the plant+regex map work over the corpus per class —
    * 3× scans at 100 TB for a 3-row answer). */
  def piiSummary(spark: SparkSession, sfDir: String): DataFrame =
    piiRedact(spark, sfDir)
      .agg(
        count(when(col("n_emails") > 0, 1)).as("e_docs"),
        sum(col("n_emails")).as("e_matches"),
        count(when(col("n_phones") > 0, 1)).as("p_docs"),
        sum(col("n_phones")).as("p_matches"),
        count(when(col("n_ips") > 0, 1)).as("i_docs"),
        sum(col("n_ips")).as("i_matches"))
      .select(expr(
        """stack(3,
          |  'email', e_docs, e_matches,
          |  'phone', p_docs, p_matches,
          |  'ipv4',  i_docs, i_matches)
          |AS (pii_type, n_docs, n_matches)""".stripMargin))

  // Oracle side: same plants, same chain, RE2 dialect. Backslashes are
  // literal inside DuckDB single-quoted strings.
  private val augSql: String =
    """SELECT doc_id, text ||
      |  (CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id ||
      |     '@ex-' || (doc_id % 7) || '.org' ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN ' tel 415-555-01' ||
      |     (doc_id % 10) || ((doc_id + 3) % 10) ELSE '' END) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || (doc_id % 256) ||
      |     '.0.' || ((doc_id * 3) % 256) ELSE '' END) AS aug
      |FROM documents""".stripMargin

  private def redactChainSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'$EmailRe', '<EMAIL>', 'g'), " +
      s"'$PhoneRe', '<PHONE>', 'g'), " +
      s"'$Ipv4Re', '<IP>', 'g')"

  val piiRedactSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(aug, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(length(${redactChainSql("aug")}) AS BIGINT) AS red_len,
       |  ${Hashing.stringHashSql(redactChainSql("aug"))} AS red_hash
       |FROM ($augSql)""".stripMargin

  val piiSummarySql: String =
    s"""WITH per AS ($piiRedactSql)
       |SELECT 'email' AS pii_type,
       |  CAST(COUNT(CASE WHEN n_emails > 0 THEN 1 END) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_emails) AS BIGINT) AS n_matches FROM per
       |UNION ALL
       |SELECT 'phone', CAST(COUNT(CASE WHEN n_phones > 0 THEN 1 END) AS BIGINT),
       |  CAST(SUM(n_phones) AS BIGINT) FROM per
       |UNION ALL
       |SELECT 'ipv4', CAST(COUNT(CASE WHEN n_ips > 0 THEN 1 END) AS BIGINT),
       |  CAST(SUM(n_ips) AS BIGINT) FROM per""".stripMargin

  /** Minimum safe equivalence-class size for [[kAnonymity]]. */
  val KAnon = 5L

  /** k-anonymity / l-diversity audit over the customer table's
    * quasi-identifier pair (nation, market segment) — the re-
    * identification risk report a privacy pass produces BEFORE a
    * dataset ships (Sweeney 2002; Machanavajjhala 2007): per
    * equivalence class, its size (k), whether it clears [[KAnon]], and
    * the diversity (distinct count) of a sensitive attribute — here
    * the account-balance sign — whose l = 1 classes leak the attribute
    * even when k is large. Joining a "de-identified" dump against a
    * public roster on the quasi-identifiers is exactly a keyed join;
    * classes below k are the rows that join uniquely enough to name.
    *
    * Scale shape: ONE map-side-combinable groupBy on the quasi-
    * identifier pair; the report is |nations|·|segments| rows at any
    * corpus size. */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("k"),
        countDistinct(when(col("c_acctbal") >= 0, 1L).otherwise(0L))
          .as("l_diversity"))
      .withColumn("at_risk", col("k") < KAnon)
      .withColumn("attr_leak", col("l_diversity") === 1L)

  val kAnonymitySql: String =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |  c_mktsegment AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS k,
       |  CAST(COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 1
       |    ELSE 0 END) AS BIGINT) AS l_diversity,
       |  COUNT(*) < $KAnon AS at_risk,
       |  COUNT(DISTINCT CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) = 1
       |    AS attr_leak
       |FROM customer GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_k_anonymity" -> (kAnonymity _),
    "pii_redact" -> (piiRedact _),
    "pii_summary" -> (piiSummary _))

  val oracles: Map[String, String] = Map(
    "privacy_k_anonymity" -> kAnonymitySql,
    "pii_redact" -> piiRedactSql,
    "pii_summary" -> piiSummarySql)
}
