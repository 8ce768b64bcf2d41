package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** The END-TO-END ship gate — every curation stage composed into the one
  * artifact a training run consumes: the packed-sequence manifest of the
  * admitted training split.
  *
  * A document ships iff it
  *  1. clears the quality gate (quality_score >= 0.5 — the
  *     [[Curation.curate]] rule),
  *  2. is its duplicate-group keeper (min doc_id per normalized-text
  *     fingerprint — [[Dedup.fingerprintDedup]]),
  *  3. is NOT in the held-out eval sample and NOT contaminated by it
  *     (>= 10% 8-gram shingle overlap — [[Curation.decontamOverlap]]),
  *  4. lands in the train split (polyHash("split:"+doc_id) mod 100 < 80
  *     — [[Curation.splitReport]]'s membership function).
  * Admitted docs are then packed into fixed token-budget training rows
  * by the doc-atomic next-fit packer under EXACT tokenizer token counts
  * ([[Tokenize.corpusPackTokens]]'s unit).
  *
  * This is deliberately a COMPOSITION of already-gated stages — each
  * predicate and the packer are bitwise the individually-verified ops,
  * so the gate proves the stages compose without semantic drift (filter
  * pushdown, join reordering, and the packer's segment structure all
  * interact here and nowhere else).
  *
  * Scale shape: each admission predicate is a doc_id-keyed semi/anti
  * join against a frame that is itself scale-safe (quality: map-side
  * scoring; keepers: one fingerprint groupBy; decontam: constant-size
  * eval broadcast; split: pure hash map-side). The packer adds its one
  * segment-keyed exchange. Nothing here introduces a new shuffle shape —
  * at 100 TB the admission chain co-partitions on doc_id after the first
  * exchange and AQE collapses the semi-joins into broadcasts while the
  * predicate frames fit.
  */
object Pipeline {

  /** doc_ids admitted to the shipped training set (rules 1–4 above). */
  private[graft] def admittedTrainDocs(spark: SparkSession,
      sfDir: String): DataFrame = {
    val qual = TextAnalysis.textQuality(spark, sfDir)
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"))
    val keepers = Dedup.fingerprintDedup(spark, sfDir)
      .select(col("keeper").as("doc_id"))
    val (evalIds, overlap) = Curation.decontamParts(spark, sfDir)
    val contaminated = overlap.filter(col("contaminated") === 1L)
      .select(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"))
      .filter(GraftFunctions.polyHash(
        concat_ws(":", lit("split"), col("doc_id").cast("string"))) % 100 < 80)
      .join(qual, Seq("doc_id"), "left_semi")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(evalIds, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Gated: the shipped-training-set pack manifest — (doc_id, n_tok,
    * pack_id, pack_off) over exactly the admitted docs. */
  def trainManifest(spark: SparkSession, sfDir: String): DataFrame =
    Packing.packAtomicOf(
      Tokenize.corpusTokenize(spark, sfDir)
        .join(admittedTrainDocs(spark, sfDir), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("n_tokens").as("raw_tok")))

  /** Gated: the admission attrition table — how many docs survive each
    * cumulative stage of the ship gate, in gate order. THE observability
    * artifact a curation pipeline watches: a stage whose survivor count
    * moves sharply between snapshots is the stage that broke (or the
    * corpus that shifted). Same predicate frames as [[trainManifest]] —
    * the funnel IS the manifest's admission chain, counted per stage.
    *
    * Scale shape: six 1-row aggregates over semi/anti-join chains whose
    * legs are each scale-safe (see [[admittedTrainDocs]]); the union is
    * six rows. */
  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val qual = TextAnalysis.textQuality(spark, sfDir)
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"))
    val keepers = Dedup.fingerprintDedup(spark, sfDir)
      .select(col("keeper").as("doc_id"))
    val (evalIds, overlap) = Curation.decontamParts(spark, sfDir)
    val contaminated = overlap.filter(col("contaminated") === 1L)
      .select(col("doc_id"))
    val raw = Tables.documents(spark, sfDir).select(col("doc_id"))
    val split = raw.filter(GraftFunctions.polyHash(
      concat_ws(":", lit("split"), col("doc_id").cast("string"))) % 100 < 80)
    val s2 = split.join(qual, Seq("doc_id"), "left_semi")
    val s3 = s2.join(keepers, Seq("doc_id"), "left_semi")
    val s4 = s3.join(evalIds, Seq("doc_id"), "left_anti")
    val s5 = s4.join(contaminated, Seq("doc_id"), "left_anti")
    val stages = Seq(
      (0L, "raw", raw), (1L, "train_split", split), (2L, "quality", s2),
      (3L, "dedup_keeper", s3), (4L, "not_eval", s4), (5L, "shipped", s5))
    stages.map { case (ord, name, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
          col("n_docs"))
    }.reduce(_.unionAll(_))
  }

  /** Gated: the dataset-card numbers of the shipped set — one row:
    * admitted docs, packs, exact token mass, and overall fill in basis
    * points (what fraction of the bought context windows the curated
    * corpus actually fills). */
  def trainSummary(spark: SparkSession, sfDir: String): DataFrame =
    trainManifest(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_tok")).as("n_tokens"))
      .select(col("n_docs"), col("n_packs"), col("n_tokens"),
        expr(s"(n_tokens * 10000L) div (n_packs * ${Packing.Budget}L)")
          .as("fill_bp"))

  // ------------------------------------------------------------ oracles

  /** Admission CTEs + the packer chain. The quality CTE wraps the exact
    * [[TextAnalysis.textQualitySql]] statement; keepers/split are the
    * exact [[Curation]] expressions; decontam splices
    * [[Curation.decontamSqlCtes]]; tokenization splices
    * [[Tokenize.tokCtes]]. Oracle and engine share every stage
    * definition, so a drift in any ONE stage breaks its own gate AND
    * this one. */
  /** The admission-predicate CTEs (decontam chain + qd/kd/cont) — shared
    * by the manifest, summary, and funnel oracles so all three splice
    * the same stage definitions. */
  private[graft] val admissionSqlCtes: String =
    s"""${Curation.decontamSqlCtes},
       |qd AS (SELECT doc_id FROM (${TextAnalysis.textQualitySql})
       |  WHERE quality_score >= 0.5),
       |kd AS (SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
       |cont AS (SELECT doc_id FROM ex LEFT JOIN evh ON ex.h = evh.h
       |  GROUP BY doc_id, n_sh
       |  HAVING SUM(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END) * 10 >= n_sh)""".stripMargin

  private val manifestCtes: String = {
    val splitHash = Hashing.stringHashSql("'split:' || CAST(d.doc_id AS VARCHAR)")
    val extra =
      s"""${Tokenize.tokCtes},
         |$admissionSqlCtes,
         |""".stripMargin
    val d0Body =
      s"""SELECT d.doc_id,
         |    least(COALESCE(pd.n_tokens, 0), ${Packing.Budget}) AS n_tok,
         |    ${Hashing.idHashSql("d.doc_id")} AS k
         |  FROM documents d LEFT JOIN perdoc pd USING (doc_id)
         |  WHERE ($splitHash) % 100 < 80
         |    AND d.doc_id IN (SELECT doc_id FROM qd)
         |    AND d.doc_id IN (SELECT doc_id FROM kd)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM ev)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin
    Packing.packCtesFor(extra, d0Body)
  }

  val trainManifestSql: String =
    s"""$manifestCtes
       |SELECT doc_id, n_tok, seg * ${Packing.PackIdStride} + pack AS pack_id,
       |  off AS pack_off
       |FROM rec""".stripMargin

  val trainSummarySql: String =
    s"""$manifestCtes
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT seg * ${Packing.PackIdStride} + pack) AS BIGINT)
       |    AS n_packs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  (CAST(SUM(n_tok) AS BIGINT) * 10000)
       |    // (COUNT(DISTINCT seg * ${Packing.PackIdStride} + pack)
       |        * ${Packing.Budget}) AS fill_bp
       |FROM rec""".stripMargin

  val curationFunnelSql: String = {
    val splitHash = Hashing.stringHashSql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH $admissionSqlCtes,
       |fsp AS (SELECT doc_id FROM documents WHERE ($splitHash) % 100 < 80),
       |f2 AS (SELECT doc_id FROM fsp
       |  WHERE doc_id IN (SELECT doc_id FROM qd)),
       |f3 AS (SELECT doc_id FROM f2
       |  WHERE doc_id IN (SELECT doc_id FROM kd)),
       |f4 AS (SELECT doc_id FROM f3
       |  WHERE doc_id NOT IN (SELECT doc_id FROM ev)),
       |f5 AS (SELECT doc_id FROM f4
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cont))
       |SELECT CAST(0 AS BIGINT) AS stage_ord, 'raw' AS stage,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
       |UNION ALL SELECT 1, 'train_split',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fsp)
       |UNION ALL SELECT 2, 'quality',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f2)
       |UNION ALL SELECT 3, 'dedup_keeper',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f3)
       |UNION ALL SELECT 4, 'not_eval',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f4)
       |UNION ALL SELECT 5, 'shipped',
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f5)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_train_manifest" -> (trainManifest _),
    "corpus_train_summary" -> (trainSummary _),
    "corpus_curation_funnel" -> (curationFunnel _))

  val oracles: Map[String, String] = Map(
    // Materialized like the Tokenize pack oracles (tokenize + admission
    // chains re-expand per next-fit rank otherwise); `tok`/`rec` stay
    // plain (recursive working tables), and `vocab` stays plain because
    // the engine mis-executes a correlated subquery inside a RECURSIVE
    // CTE when its target is MATERIALIZED (see the Tokenize oracles).
    "corpus_train_manifest" ->
      Hashing.materializeCtes(trainManifestSql,
        except = Set("tok", "rec", "vocab")),
    "corpus_train_summary" ->
      Hashing.materializeCtes(trainSummarySql,
        except = Set("tok", "rec", "vocab")),
    "corpus_curation_funnel" -> curationFunnelSql)
}
