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

  /** Rebalance-to-uniform mixture sampler — the training-mix reweighting
    * twin of [[sampleStratified]]: instead of fixed config rates, the
    * per-source acceptance rate is COMPUTED from corpus statistics, the
    * shape a DoReMi-style mixture pass takes when the target weights are
    * derived rather than hand-set. The balance unit is CHAR MASS, not
    * doc count — training mixes are planned by token/char budget (the
    * quantity [[sourceMixture]]'s char_share reports), and the synthetic
    * corpus's sources are exactly uniform in doc count at every SF, so a
    * count-based gate would be vacuous (all rates 1000).
    *
    * rate_pm(s) = min_char_mass * 1000 div char_mass_s (integer
    * permille; the lightest source keeps everything at 1000 — `div`
    * floors identically in both engines). Accept iff
    * polyHash("mix:" + doc_id) mod 1000 < rate_pm — stateless hash
    * thresholding: no RNG state, identical under retries and
    * re-partitioning, and each doc's fate is independent of every other
    * doc's, so the sample composes with incremental ingestion.
    *
    * Scale shape: the per-source mass is a tiny map-side-combinable
    * aggregation (O(#sources) rows); the rate frame is broadcast back
    * onto the corpus (hinted — #sources is SF-independent); the accept
    * test is pure map-side. One scan + one broadcast join, no
    * corpus-sized shuffle. */
  def sampleMixtureBalanced(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val mass = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("sc"))
    val minM = mass.agg(min(col("sc")).as("mn"))
    val rates = mass.crossJoin(minM)
      .select(col("source"), expr("mn * 1000 div sc").as("rate_pm"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(GraftFunctions.polyHash(
        concat_ws(":", lit("mix"), col("doc_id").cast("string"))) % 1000
        < col("rate_pm"))
      .select(col("doc_id"), col("source"), col("rate_pm"))
  }

  val sampleMixtureBalancedSql: String = {
    val h = Hashing.stringHashSql("'mix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sc
       |  FROM documents GROUP BY source),
       |m AS (SELECT MIN(sc) AS mn FROM c),
       |r AS (SELECT source, CAST(mn * 1000 // sc AS BIGINT) AS rate_pm FROM c, m)
       |SELECT d.doc_id, d.source, r.rate_pm
       |FROM documents d JOIN r USING (source)
       |WHERE ($h) % 1000 < r.rate_pm""".stripMargin
  }

  /** Temperature-based mixture sampling (the mT5/XLM-R α-weighted source
    * formula at α = 1/2): accept docs of source i at a rate ∝ mᵢ^(α−1) =
    * 1/√mᵢ, so the sampled mass follows √mᵢ — big sources give up share
    * without being crushed to the [[sampleMixtureBalanced]] uniform cap,
    * small sources are boosted but not replicated. α = 1/2 specifically
    * because it is the one non-trivial temperature both engines can
    * compute EXACTLY: floor(√n) of a BIGINT is deterministic (IEEE sqrt
    * is correctly rounded; both engines floor the same double), so the
    * permille rates stay integer-exact with no libm-divergence risk —
    * the same reason the money math is integer cents.
    *
    * Same scale shape as the balanced sampler: O(#sources) agg broadcast
    * back, stateless hash-threshold accept per row, retry-stable. */
  def sampleMixtureTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val mass = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("sc"))
    val minM = mass.agg(min(col("sc")).as("mn"))
    val rates = mass.crossJoin(minM)
      .select(col("source"),
        expr("(cast(floor(sqrt(mn)) as bigint) * 1000) " +
          "div cast(floor(sqrt(sc)) as bigint)").as("rate_pm"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(GraftFunctions.polyHash(
        concat_ws(":", lit("temp"), col("doc_id").cast("string"))) % 1000
        < col("rate_pm"))
      .select(col("doc_id"), col("source"), col("rate_pm"))
  }

  val sampleMixtureTemperatureSql: String = {
    val h = Hashing.stringHashSql("'temp:' || CAST(doc_id AS VARCHAR)")
    s"""WITH c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sc
       |  FROM documents GROUP BY source),
       |m AS (SELECT MIN(sc) AS mn FROM c),
       |r AS (SELECT source,
       |  (CAST(FLOOR(SQRT(mn)) AS BIGINT) * 1000)
       |    // CAST(FLOOR(SQRT(sc)) AS BIGINT) AS rate_pm FROM c, m)
       |SELECT d.doc_id, d.source, r.rate_pm
       |FROM documents d JOIN r USING (source)
       |WHERE ($h) % 1000 < r.rate_pm""".stripMargin
  }

  /** Deterministic 80/10/10 train/val/test split, reported per
    * (lang, split) — the canonical dataset-preparation op. Membership
    * is a pure function of doc_id (polyHash mod 100: <80 train,
    * <90 val, else test), so the three sets are EXCLUSIVE and
    * EXHAUSTIVE by construction, stable under retries, re-partitioning
    * and incremental ingestion (a new doc's split never depends on
    * other docs), and reproducible by any engine that can hash. The
    * gate reports counts + char mass per cell; splits within a
    * language land near 80/10/10 because the hash is uniform, and the
    * report is the artifact a dataset card quotes. Map-side classify +
    * one tiny grouped agg. */
  def splitReport(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        GraftFunctions.polyHash(
          concat_ws(":", lit("split"), col("doc_id").cast("string"))) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))

  val splitReportSql: String = {
    val h = Hashing.stringHashSql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT lang,
       |  CASE WHEN ($h) % 100 < 80 THEN 'train'
       |       WHEN ($h) % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars
       |FROM documents GROUP BY 1, 2""".stripMargin
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

  /** Columns the profiler audits (text is deliberately excluded:
    * COUNT(DISTINCT text) over a 100 TB corpus is the job the dedup
    * layer's fingerprint/minhash sketches exist to avoid). */
  private val ProfileCols = Seq("doc_id", "lang", "source", "n_chars")

  /** Data-profiling audit: one row per column with null count, exact
    * distinct count, and min/max (canonical strings) — the schema
    * sanity report every ingestion batch gets before entering the mix.
    *
    * Scale shape: ONE scan; the multi-column COUNT(DISTINCT) plans as
    * Spark's Expand (×4 rows map-side, one shuffle). That is the right
    * trade at audit cardinalities (ids, langs, sources, lengths); a
    * 100 TB profile of a high-cardinality free-text column would swap
    * the exact distinct for the KMV sketch (Sketches.kmvDistinctWords)
    * — the rest of the report is plain map-side aggregation. */
  def corpusProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val aggExprs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nu_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val agged = d.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = ProfileCols.map { c =>
      s"'$c', nu_$c, nd_$c, mn_$c, mx_$c"
    }.mkString(", ")
    agged.select(col("n_rows"), expr(
      s"stack(${ProfileCols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  val corpusProfileSql: String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_val,
         |  CAST(MAX($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")

  // --------------------------------------------------- decontamination

  /** Shingle width for eval-set decontamination: long n-grams (8 words)
    * so only real verbatim overlap — not topical similarity — fires. */
  private val DecontamK = 8

  /** Held-out docs in the fixed eval set: CONSTANT at any SF (smallest
    * idHash order), so the broadcast shingle universe stays bounded —
    * the same invariant as every audit sample in Dedup/Similarity. */
  private val DecontamEvalN = 16

  /** Benchmark decontamination: flag training docs whose 8-word-shingle
    * sets overlap a held-out eval set — the standard train/test-leakage
    * gate an LLM data pipeline runs before a corpus ships.
    *
    * Shape at 100 TB: the eval side is a FIXED 16-doc sample, so its
    * distinct shingle universe is constant-size and broadcasts; the
    * corpus streams through one broadcast hash probe + one groupBy on
    * doc_id (map-side combinable). No all-pairs term anywhere — the
    * quadratic object (doc × eval-doc) never materializes, only
    * (shingle, hit) rows bounded by corpus shingle mass. A real run
    * swaps the sample for the actual benchmark suite, which is equally
    * constant-size relative to the training corpus.
    *
    * `contaminated` fires at ≥10% shingle overlap, cross-multiplied so
    * both engines compare exact integers. */
  /** (eval-doc ids, per-doc overlap frame) — the decontam internals,
    * exposed so the end-to-end ship gate ([[Pipeline]]) can exclude BOTH
    * the contaminated docs and the eval docs themselves without
    * recomputing the shingle pass. */
  private[graft] def decontamParts(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Hashing.shingleHashes(Hashing.wordHashes(col("text")), DecontamK).as("sh"))
      .filter(size(col("sh")) > 0)
    val eval = sh
      .orderBy(Hashing.idHash(col("doc_id")), col("doc_id"))
      .limit(DecontamEvalN)
    val evalIds = eval.select(col("doc_id").as("eval_id"))
    val evalSh = eval.select(explode(col("sh")).as("h")).distinct()
      .withColumn("m", lit(1L))
    val overlap = sh
      .join(broadcast(evalIds), col("doc_id") === col("eval_id"), "left_anti")
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("h"))
      .join(broadcast(evalSh), Seq("h"), "left")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(sum(coalesce(col("m"), lit(0L))).as("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        when(col("n_hit") * 10 >= col("n_sh"), 1L).otherwise(0L)
          .as("contaminated"))
    (evalIds.select(col("eval_id").as("doc_id")), overlap)
  }

  def decontamOverlap(spark: SparkSession, sfDir: String): DataFrame =
    decontamParts(spark, sfDir)._2

  /** Probe count for semantic decontamination — a CONSTANT-size
    * idHash sample (the [[Similarity]] discipline), so the broadcast
    * stays bounded at any corpus scale. */
  val SemEvalN = 16

  /** Semantic decontamination — the embedding-space sibling of
    * [[decontamOverlap]]: the lexical pass catches verbatim/near-
    * verbatim leakage, but an eval item paraphrased into the training
    * set shares no 8-gram; cosine against a held-out probe set is the
    * standard second line (the Phi/Llama eval-decontam recipe). A
    * corpus vector is contaminated iff cos ≥ τ against ANY probe —
    * evaluated EXACTLY as 25·dot² ≥ 4·‖a‖²‖b‖² ∧ dot > 0 (τ = 0.4;
    * production embedding models sit near 0.8, but this fixture's
    * synthetic cloud tops out at cos ≈ 0.49 against any probe, so 0.4
    * is the value that makes BOTH flag arms land at every SF — the
    * threshold is a dial, the compare shape is the contract) on the
    * shared integer quantization (squares leave Long range, so the
    * compare runs in decimal(38,0)/HUGEINT — no float at the
    * threshold).
    *
    * Scale shape: one broadcast of the [[SemEvalN]]-row probe sample
    * against the corpus scan (the constant-size-sample crossJoin
    * pattern, not a data cross join), one map-side-combinable per-vec
    * count, one left join back for the zero-hit rows. */
  def decontamSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val q = Similarity.quantized(spark, sfDir).localCheckpoint()
    val probes = q
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
      .limit(SemEvalN)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"),
        col("nrm").as("pnrm"))
    val probeIds = probes.select(col("probe_id"))
    val dot = graft.functions.GraftFunctions.dotLong(col("qv"), col("pqv"))
    val hits = q
      .join(broadcast(probeIds), col("vec_id") === col("probe_id"),
        "left_anti")
      .crossJoin(broadcast(probes))
      .withColumn("dot", dot)
      .filter(col("dot") > 0 &&
        lit(25).cast("decimal(38,0)") * col("dot").cast("decimal(38,0)") *
          col("dot").cast("decimal(38,0)") >=
          lit(4).cast("decimal(38,0)") * col("nrm").cast("decimal(38,0)") *
            col("pnrm").cast("decimal(38,0)"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_hit"))
    q.join(broadcast(probeIds), col("vec_id") === col("probe_id"),
        "left_anti")
      .select(col("vec_id"))
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_probes_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0L).as("contaminated"))
  }

  val decontamSemanticSql: String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |probes AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm
       |  FROM n ORDER BY ${Hashing.idHashSql("vec_id")}, vec_id
       |  LIMIT $SemEvalN),
       |corpus AS (SELECT * FROM n
       |  WHERE vec_id NOT IN (SELECT probe_id FROM probes)),
       |pairs AS (SELECT c.vec_id,
       |    CAST(list_sum(list_transform(range(1, len(c.qv)+1),
       |      i -> c.qv[i] * p.pqv[i])) AS BIGINT) AS dot,
       |    c.nrm, p.pnrm
       |  FROM corpus c, probes p),
       |h AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM pairs
       |  WHERE dot > 0 AND 25 * CAST(dot AS HUGEINT) * dot
       |    >= 4 * CAST(nrm AS HUGEINT) * pnrm
       |  GROUP BY 1)
       |SELECT c.vec_id,
       |  COALESCE(h.n_hit, 0) AS n_probes_hit,
       |  COALESCE(h.n_hit, 0) > 0 AS contaminated
       |FROM corpus c LEFT JOIN h ON c.vec_id = h.vec_id""".stripMargin

  /** The decontam CTE chain (sh0 → sh → shf → ev → evh → ex) as a
    * splice-able WITH body — shared by [[decontamOverlapSql]] and the
    * ship-gate oracle in [[Pipeline]]. */
  private[graft] val decontamSqlCtes: String =
    s"""sh0 AS (SELECT doc_id, ${Hashing.wordHashesSql("text")} AS whs
       |  FROM documents),
       |sh AS (SELECT doc_id, ${Hashing.shingleHashesSql("whs", DecontamK)} AS sh
       |  FROM sh0),
       |shf AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |ev AS (SELECT doc_id, sh FROM shf
       |  ORDER BY ${Hashing.idHashSql("doc_id")}, doc_id LIMIT $DecontamEvalN),
       |evh AS (SELECT DISTINCT unnest(sh) AS h FROM ev),
       |ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS h FROM shf
       |  WHERE doc_id NOT IN (SELECT doc_id FROM ev))""".stripMargin

  val decontamOverlapSql: String =
    s"""WITH $decontamSqlCtes
       |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
       |  CAST(SUM(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hit,
       |  CAST(CASE WHEN SUM(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END) * 10
       |    >= n_sh THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM ex LEFT JOIN evh ON ex.h = evh.h
       |GROUP BY doc_id, n_sh""".stripMargin

  // ------------------------------------------------- per-source report

  /** Domain-level curation report — the FineWeb/DataComp "which sources
    * do we trust" artifact: one row per source with its volume, language
    * spread, quality-gate pass count, exact mean quality (permille),
    * duplicate shadow count, and boilerplate-heavy doc count. The
    * decision this feeds (keep / demote / drop a domain) is the coarsest
    * and cheapest lever a 100 TB pipeline has, applied before any
    * per-doc work.
    *
    * Every measure is a gated stage reused, not re-derived: quality is
    * [[TextAnalysis.textQuality]]'s score (floored to integer permille so
    * the per-source SUM is order-independent — never sum raw doubles
    * across a group), keepers are [[Dedup.fingerprintDedup]]'s rule,
    * boilerplate docs are [[Substring.boilerplate]] rows with a full
    * footer's worth (≥ 8) of per-source recurring spans.
    *
    * Scale shape: four independent per-source aggregates (each map-side
    * combinable; the quality/keeper/boilerplate legs are doc_id-keyed
    * joins against frames that are themselves scale-safe) merged by
    * LEFT joins on a #sources-row key — AQE broadcasts every merge. A
    * source missing from a leg (e.g. all its docs shadowed by another
    * source's keepers) coalesces to 0 rather than vanishing. */
  def sourceReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val src = docs.select(col("doc_id"), col("source"))
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val qual = TextAnalysis.textQuality(spark, sfDir)
      .select(col("doc_id"),
        floor(col("quality_score") * 1000).cast("long").as("q_pm"))
      .join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(when(col("q_pm") >= 500, 1)).as("n_quality_keep"),
        sum(col("q_pm")).as("q_mass"))
    val keep = Dedup.fingerprintDedup(spark, sfDir)
      .select(col("keeper").as("doc_id"))
      .join(src, Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_keepers"))
    val bp = Substring.boilerplate(spark, sfDir)
      .filter(col("n_bp_spans") >= 8)
      .groupBy(col("source")).agg(count(lit(1)).as("n_bp_docs"))
    // The legs are per-source aggregates (#sources rows by construction),
    // but the static planner can't see that through the agg — declare the
    // broadcast instead of waiting for AQE to discover it at runtime.
    base.join(broadcast(qual), Seq("source"), "left")
      .join(broadcast(keep), Seq("source"), "left")
      .join(broadcast(bp), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_langs"),
        coalesce(col("n_quality_keep"), lit(0L)).as("n_quality_keep"),
        expr("coalesce(q_mass, 0L) div n_docs").as("mean_q_permille"),
        coalesce(col("n_keepers"), lit(0L)).as("n_keepers"),
        (col("n_docs") - coalesce(col("n_keepers"), lit(0L)))
          .as("n_dup_extra"),
        coalesce(col("n_bp_docs"), lit(0L)).as("n_bp_docs"))
  }

  val sourceReportSql: String =
    s"""WITH ${Substring.bpSqlCtes},
       |tq AS (SELECT doc_id, CAST(FLOOR(quality_score * 1000) AS BIGINT)
       |    AS q_pm FROM (${TextAnalysis.textQualitySql})),
       |srcm AS (SELECT doc_id, source FROM documents),
       |sbase AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
       |  FROM documents GROUP BY source),
       |sq AS (SELECT source,
       |  CAST(COUNT(CASE WHEN q_pm >= 500 THEN 1 END) AS BIGINT)
       |    AS n_quality_keep,
       |  CAST(SUM(q_pm) AS BIGINT) AS q_mass
       |  FROM tq JOIN srcm USING (doc_id) GROUP BY source),
       |skd AS (SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
       |sk AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_keepers
       |  FROM skd JOIN srcm USING (doc_id) GROUP BY source),
       |sb AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bp_docs
       |  FROM bcov WHERE n_bp_spans >= 8 GROUP BY source)
       |SELECT sbase.source, n_docs, n_chars, n_langs,
       |  COALESCE(n_quality_keep, 0) AS n_quality_keep,
       |  COALESCE(q_mass, 0) // n_docs AS mean_q_permille,
       |  COALESCE(n_keepers, 0) AS n_keepers,
       |  n_docs - COALESCE(n_keepers, 0) AS n_dup_extra,
       |  COALESCE(n_bp_docs, 0) AS n_bp_docs
       |FROM sbase LEFT JOIN sq USING (source) LEFT JOIN sk USING (source)
       |  LEFT JOIN sb USING (source)""".stripMargin

  /** Source-diversity audit under the integer floor-log2 measure every
    * scoring key here uses: per-source doc share in floored permille
    * and the source's draw surprisal bits(s) = fl2(N) − fl2(n_s) — the
    * corpus-collapse early-warning (one source swallowing the mixture
    * shows up as share→1000, bits→0, before training ever sees it).
    * One map-side-combinable agg + a 1-row broadcast; #sources rows at
    * any SF. */
  def sourceEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val perSrc = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = perSrc.agg(sum(col("n_docs")).as("total"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(n_docs * 1000) div total").as("share_permille"),
        (length(bin(col("total"))) - length(bin(col("n_docs"))))
          .cast("long").as("bits"))
  }

  val sourceEntropySql: String =
    """WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM s)
      |SELECT source, n_docs, (n_docs * 1000) // total AS share_permille,
      |  CAST(length(bin(total)) - length(bin(n_docs)) AS BIGINT) AS bits
      |FROM s, t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_source_entropy" -> (sourceEntropy _),
    "corpus_source_report" -> (sourceReport _),
    "corpus_curate" -> (curate _),
    "sample_stratified" -> (sampleStratified _),
    "corpus_split_report" -> (splitReport _),
    "sample_mixture_balanced" -> (sampleMixtureBalanced _),
    "sample_mixture_temperature" -> (sampleMixtureTemperature _),
    "source_mixture" -> (sourceMixture _),
    "corpus_profile" -> (corpusProfile _),
    "decontam_overlap" -> (decontamOverlap _),
    "decontam_semantic" -> (decontamSemantic _))

  val oracles: Map[String, String] = Map(
    "decontam_semantic" -> decontamSemanticSql,
    "corpus_source_entropy" -> sourceEntropySql,
    "corpus_source_report" -> sourceReportSql,
    "corpus_curate" -> curateSql,
    "sample_stratified" -> sampleStratifiedSql,
    "corpus_split_report" -> splitReportSql,
    "sample_mixture_balanced" -> sampleMixtureBalancedSql,
    "sample_mixture_temperature" -> sampleMixtureTemperatureSql,
    "source_mixture" -> sourceMixtureSql,
    "corpus_profile" -> corpusProfileSql,
    "decontam_overlap" -> decontamOverlapSql)
}
