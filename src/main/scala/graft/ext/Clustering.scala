package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Distributed k-means over the embedding corpus + SemDeDup-style
  * semantic deduplication (Abbas et al. 2023: cluster the embedding
  * space, then search for near-duplicates only WITHIN a cluster — the
  * trick that turns an O(n^2) semantic-dedup pass into K independent
  * cell-bounded ones).
  *
  * K-means, the Spark way: one Lloyd iteration is (a) a broadcast of the
  * K centroids, (b) one map-side argmin pass over the corpus, (c) a
  * map-side-combinable (cluster, dim) partial-sum shuffle of K*64 rows.
  * No driver-side loops over data, no collect; iterations are a fixed
  * small count (init -> one update -> final assignment), each a flat
  * dataflow stage. K is constant here (oracle-replayable); production
  * scales K with corpus size to keep cells bounded, which changes only
  * the broadcast size, not the plan shape.
  *
  * Cross-engine exactness: vectors ride [[Similarity]]'s integer
  * quantization; squared-L2 distances are exact Longs
  * (|v|^2 + |c|^2 - 2<v,c>, argmin tie-broken by centroid id); centroid
  * means use integer division truncating toward zero — Spark's `div`
  * and DuckDB's `//` agree on that semantics for any sign (verified:
  * -7//2 = -3 in both). Inertia sums fit Long up to
  * ~7e8 vectors per cluster at this quantization; an extreme-scale
  * deployment would widen the final sum to DECIMAL(38).
  */
object Clustering {

  private val K = 8

  /** Semantic near-dup threshold: cos >= 0.4 within a cluster (measured
    * non-vacuous on the synthetic embeddings: ~20 pairs at sf0.001). */
  private val SemThreshold = 0.4

  private def sqDist(nrm: Column, cnrm: Column, qv: Column, cqv: Column): Column =
    nrm + cnrm - lit(2L) * GraftFunctions.dotLong(qv, cqv)

  /** One argmin-assignment pass: every vector gets the centroid of
    * minimum squared L2 distance (ties to the smaller cid). Centroids
    * are K rows — always broadcast. */
  private def assign(base: DataFrame, cent: DataFrame): DataFrame = {
    val d = sqDist(col("nrm"), col("cnrm"), col("qv"), col("cqv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    base.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"), d.as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"), col("dist"))
  }

  /** Init centroids: the K corpus vectors of smallest idHash — the same
    * deterministic constant-size-sample rule as the IVF quantizer. */
  private def initCentroids(base: DataFrame): DataFrame =
    base.orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
      .limit(K)
      .select(col("vec_id").as("cid"), col("qv").as("cqv"), col("nrm").as("cnrm"))

  /** Assignment against the INIT centroids (pre-update) — exposed so the
    * spec can pin that the Lloyd step actually reduces inertia. */
  private[graft] def initAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Similarity.quantized(spark, sfDir)
    assign(base, initCentroids(base))
  }

  /** The Lloyd-updated (mean) centroids — exposed for the residual-PQ
    * encoder, which subtracts each vector's assigned MEAN centroid
    * (cosine-sample centroids would widen residuals, means shrink
    * them).
    *
    * Session-memoized (round-17 optimization): SIX gated keys
    * (kmeans, semantic dedup, outliers, diverse sample, label purity,
    * residual PQ) each consume the Lloyd-updated centroids, and each
    * execution re-ran the update — one full corpus assign pass plus a
    * corpus×Dim posexplode aggregation, the dominant per-consumer cost
    * at scale. The centroid frame is K rows (K=8) at ANY corpus size —
    * squarely inside the [[Frames.sessionMemo]] bounded-frame contract.
    * Consumers still pay their own corpus-scale assignment against the
    * memoized centroids (the honest at-scale minimum); only the
    * duplicated training pass collapses. */
  private[graft] def finalCentroids(spark: SparkSession,
      sfDir: String): DataFrame =
    Frames.sessionMemo("kmeans_centroids", spark, sfDir) {
      finalCentroidsBuild(spark, sfDir).localCheckpoint()
    }

  /** The un-memoized Lloyd update — the frame the memo builds once per
    * session. */
  private[graft] def finalCentroidsBuild(spark: SparkSession,
      sfDir: String): DataFrame = {
    val base = Similarity.quantized(spark, sfDir)
    val a1 = assign(base, initCentroids(base))
    // Exact-integer centroid update: component-wise floor(sum/count).
    // K*64 partial-sum rows, map-side combinable. The INIT assignment
    // cannot have empty clusters (every init centroid is itself a corpus
    // vector, distance 0 to itself); after the update, reassignment CAN
    // drain a cluster, so the final report may carry fewer than K rows —
    // consumers must treat a missing cid as size 0, not assume K rows.
    val sums = a1.select(col("cid"), posexplode(col("qv")))
      .toDF("cid", "d", "v")
      .groupBy(col("cid"), col("d"))
      .agg(sum(col("v")).as("s"))
    val cnt = a1.groupBy(col("cid")).agg(count(lit(1)).as("nv"))
    sums.join(cnt, Seq("cid"))
      .select(col("cid"), col("d"),
        expr("s div nv").as("mv")) // trunc-toward-zero == DuckDB `//`
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("mv")))),
        x => x.getField("mv")).as("cqv"))
      .withColumn("cnrm", GraftFunctions.dotLong(col("cqv"), col("cqv")))
  }

  /** Final per-vector assignment after init -> one exact-integer Lloyd
    * update: (vec_id, qv, nrm, cid, dist). */
  private[graft] def finalAssign(spark: SparkSession, sfDir: String): DataFrame =
    assign(Similarity.quantized(spark, sfDir), finalCentroids(spark, sfDir))

  /** Gated k-means report: per-cluster size and exact integer inertia
    * after one Lloyd update. The numbers a curation pipeline watches to
    * size its semantic-dedup cells and spot collapsed clusters. */
  def kmeans(spark: SparkSession, sfDir: String): DataFrame =
    finalAssign(spark, sfDir)
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("inertia"))

  /** Candidate-side cap per SemDeDup cell. K is FIXED (the gated
    * k-means contract), so cell size grows ∝ n and the within-cell
    * self-join is ∝ n²/K — measured 9.6× per 3.3× at sf10 (9.4 → 90 s)
    * before the cap. Bounding the b-side of each cell to a
    * deterministic hash-ordered subset pins pairs at n × cap — linear —
    * the same bounded-posting-list discipline as the IVF/LSH candidate
    * caps. 2048 exceeds the WHOLE corpus at every gate SF (sf0.1 has
    * 2000 vectors total), so gate results are byte-identical; above
    * that the oracle replays the identical window, so every SF stays
    * hash-green. */
  private[graft] val SemCellCap = 2048L

  /** SemDeDup: near-duplicate pairs (cos >= 0.4) searched only within a
    * k-means cluster. The cluster equi-self-join bounds candidates by
    * cell size — and the b-side cell cap ([[SemCellCap]]) keeps that
    * bound corpus-independent once fixed-K cells outgrow it; the
    * assignment frame is lineage-cut because it feeds both sides of
    * the self-join. */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val a = finalAssign(spark, sfDir)
      .select(col("cid"), col("vec_id"), col("qv"), col("nrm"))
      .localCheckpoint()
    val x = a.select(col("cid"), col("vec_id").as("vec_a"),
      col("qv").as("qa"), col("nrm").as("na"))
    val pw = Window.partitionBy(col("cid"))
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
    val y = a.withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= SemCellCap).drop("prn")
      .select(col("cid"), col("vec_id").as("vec_b"),
        col("qv").as("qb"), col("nrm").as("nb"))
    val cos = GraftFunctions.dotLong(col("qa"), col("qb")).cast("double") /
      sqrt(col("na").cast("double") * col("nb").cast("double"))
    x.join(y, Seq("cid"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("cid").as("cluster_id"), col("vec_a"), col("vec_b"),
        cos.as("cos"))
      .filter(col("cos") >= SemThreshold)
  }

  /** Per-cluster outliers: the [[OutK]] vectors FARTHEST from their
    * assigned centroid — the semantic junk detector (SemDeDup prunes
    * what is too close to its neighbors; this surfaces what is too far
    * from everything: mis-embedded, off-distribution, or garbage rows a
    * curation pass reviews or drops).
    *
    * Scale shape: reuses the assignment pass (distances already
    * computed); ranking is one row_number window on the SAME cid
    * clustering the assignment ended in; output is K*OutK rows at any
    * SF. Distance ties break by vec_id for a total order. */
  def outliers(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("dist").desc, col("vec_id"))
    finalAssign(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= OutK)
      .select(col("cid").as("cluster_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id"), col("dist"))
  }

  private val OutK = 5

  /** Diversity-balanced sample: at most [[DiverseCap]] vectors PER
    * k-means cell, chosen hash-deterministically — the cluster-balanced
    * subsampling step (dense regions of embedding space contribute at
    * most a capped share; sparse regions survive whole), the cheap
    * corpus-shaped stand-in for density-proportional pruning a la
    * SemDeDup/D4.
    *
    * Scale shape: one row_number window over the assignment's existing
    * cid clustering; the cap is a constant, so output is <= K*cap rows.
    * Hash order makes the sample retry-stable and independent of
    * partitioning (same discipline as the hash-threshold samplers). */
  def diverseSample(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("cid"))
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
    finalAssign(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= DiverseCap)
      .select(col("cid").as("cluster_id"), col("vec_id"))
  }

  private val DiverseCap = 12

  /** Cluster↔label purity — the audit that tells you whether semantic
    * dedup cells are coherent before you trust them to define "near
    * duplicate": per k-means cell, the member count, distinct-label
    * count, majority label, and purity in basis points (integer
    * division — exact across engines). A cell whose majority label
    * covers 40% of members is mixing semantics, and [[semanticDedup]]
    * inside it compares unrelated content. The same contingency is
    * what external cluster-quality measures (purity / NMI inputs)
    * start from.
    *
    * Scale shape: one keyed label join on vec_id, one (cell, label)
    * map-side-combinable count, then a K-row window — output is K rows
    * at any SF. */
  def labelPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val lab = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val counts = finalAssign(spark, sfDir)
      .join(lab, "vec_id")
      .groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("nl"))
      .localCheckpoint() // feeds both the totals agg and the argmax
    val tot = counts.groupBy(col("cid"))
      .agg(sum(col("nl")).as("n_vecs"), count(lit(1)).as("n_labels"))
    val top = counts
      .withColumn("rn", row_number().over(Window.partitionBy(col("cid"))
        .orderBy(col("nl").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("label").as("majority_label"),
        col("nl").as("n_majority"))
    tot.join(top, "cid")
      .select(col("cid").as("cluster_id"), col("n_vecs"), col("n_labels"),
        col("majority_label"), col("n_majority"),
        expr("n_majority * 10000 div n_vecs").as("purity_bp"))
  }

  lazy val labelPuritySql: String = // lazy: assignSqlCtes is declared below
    s"""WITH $assignSqlCtes,
       |lc AS (SELECT a2.cid, e2.label, CAST(COUNT(*) AS BIGINT) AS nl
       |  FROM a2 JOIN embeddings e2 ON a2.vec_id = e2.vec_id
       |  GROUP BY 1, 2),
       |ltot AS (SELECT cid, CAST(SUM(nl) AS BIGINT) AS n_vecs,
       |  CAST(COUNT(*) AS BIGINT) AS n_labels FROM lc GROUP BY cid),
       |ltop AS (SELECT cid, label, nl FROM (
       |    SELECT cid, label, nl, row_number() OVER (
       |      PARTITION BY cid ORDER BY nl DESC, label) AS rn FROM lc)
       |  WHERE rn = 1)
       |SELECT t.cid AS cluster_id, t.n_vecs, t.n_labels,
       |  p.label AS majority_label, p.nl AS n_majority,
       |  (p.nl * 10000) // t.n_vecs AS purity_bp
       |FROM ltot t JOIN ltop p ON t.cid = p.cid""".stripMargin

  // ------------------------------------------------------------ oracles

  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i -> $a[i]*$b[i])) AS BIGINT)"

  /** CTE chain ending in `a2` (vec_id, qv, nrm, cid, dist) — the final
    * assignment both oracles read. */
  private[ext] val assignSqlCtes: String = {
    val idh = Hashing.idHashSql("vec_id")
    s"""${Similarity.quantizedSqlCte},
       |cent0 AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM n
       |  ORDER BY $idh, vec_id LIMIT $K),
       |r1 AS (SELECT vec_id, qv, nrm, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY
       |    (nrm + cnrm - 2*${dotSql("qv", "cqv")}) ASC, cid) AS rn
       |  FROM n, cent0),
       |a1 AS (SELECT vec_id, qv, nrm, cid FROM r1 WHERE rn = 1),
       |sums AS (SELECT cid, d, CAST(SUM(qv[CAST(d+1 AS INTEGER)]) AS BIGINT) AS s
       |  FROM a1, (SELECT unnest(range(0, 64)) AS d) dims GROUP BY cid, d),
       |cnt AS (SELECT cid, COUNT(*) AS nv FROM a1 GROUP BY cid),
       |mm AS (SELECT cid, d, CAST(s // nv AS BIGINT) AS mv
       |  FROM sums JOIN cnt USING (cid)),
       |cent1 AS (SELECT cid, list(mv ORDER BY d) AS cqv FROM mm GROUP BY cid),
       |cent1n AS (SELECT cid, cqv,
       |  CAST(list_sum(list_transform(cqv, x -> x*x)) AS BIGINT) AS cnrm
       |  FROM cent1),
       |r2 AS (SELECT n.vec_id, n.qv, n.nrm, c.cid,
       |  (n.nrm + c.cnrm - 2*${dotSql("n.qv", "c.cqv")}) AS dist,
       |  row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |    (n.nrm + c.cnrm - 2*${dotSql("n.qv", "c.cqv")}) ASC, c.cid) AS rn
       |  FROM n, cent1n c),
       |a2 AS (SELECT vec_id, qv, nrm, cid, dist FROM r2 WHERE rn = 1)""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH $assignSqlCtes
       |SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(dist) AS BIGINT) AS inertia
       |FROM a2 GROUP BY cid""".stripMargin

  val semanticDedupSql: String = {
    val cosExpr = s"CAST(${dotSql("a.qv", "b.qv")} AS DOUBLE) / " +
      "sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE))"
    // bcap replays the Spark side's per-cell candidate cap (SemCellCap)
    // with the identical window, so capped SFs stay hash-green.
    s"""WITH $assignSqlCtes,
       |bcap AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT vec_id, qv, nrm, cid, row_number() OVER (
       |      PARTITION BY cid
       |      ORDER BY ${Hashing.idHashSql("vec_id")}, vec_id) AS prn
       |    FROM a2) z
       |  WHERE prn <= $SemCellCap)
       |SELECT a.cid AS cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  $cosExpr AS cos
       |FROM a2 a JOIN bcap b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |WHERE $cosExpr >= $SemThreshold""".stripMargin
  }

  val outliersSql: String =
    s"""WITH $assignSqlCtes
       |SELECT cid AS cluster_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
       |  CAST(dist AS BIGINT) AS dist
       |FROM (SELECT cid, vec_id, dist, row_number() OVER (
       |        PARTITION BY cid ORDER BY dist DESC, vec_id) AS rnk
       |      FROM a2)
       |WHERE rnk <= $OutK""".stripMargin

  val diverseSampleSql: String = {
    val idh = Hashing.idHashSql("vec_id")
    s"""WITH $assignSqlCtes
       |SELECT cid AS cluster_id, vec_id
       |FROM (SELECT cid, vec_id, row_number() OVER (
       |        PARTITION BY cid ORDER BY $idh, vec_id) AS rnk
       |      FROM a2)
       |WHERE rnk <= $DiverseCap""".stripMargin
  }

  /** Split-half centroid drift per label — the embedding-space
    * monitoring twin of `corpus_vocab_drift`: halve the corpus by
    * idHash parity (a deterministic A/B that stands in for
    * yesterday-vs-today snapshots), and measure how far each label's
    * centroid moves between halves. The per-dim difference keeps a
    * CLEARED denominator — d_num = n_a·S_b − n_b·S_a = n_a·n_b·(μ_b −
    * μ_a) — so the squared-shift numerator Σ d_num² accumulates
    * exactly in decimal(38,0) (d_num ≈ 3e10 at sf0.1 squares past
    * Long), and the RMS drift per dim is one IEEE sqrt/division over
    * exact inputs. On an i.i.d. split drift ≈ 0 — which is the
    * baseline a production monitor alarms against.
    *
    * Scale shape: one posexplode → (label, half, dim) map-side-
    * combinable sum (the dim-stats shape), then label-keyed joins on
    * #labels×64-row frames. */
  def centroidDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val q = Similarity.quantized(spark, sfDir)
      .join(graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("label")), "vec_id")
      .withColumn("half", Hashing.idHash(col("vec_id")) % 2)
    val dims = q.select(col("label"), col("half"),
      posexplode(col("qv")).as(Seq("dim", "qx")))
    val sums = dims.groupBy(col("label"), col("half"), col("dim"))
      .agg(sum(col("qx")).as("s"), count(lit(1)).as("nd"))
      .localCheckpoint() // both halves join below
    val a = sums.filter(col("half") === 0)
      .select(col("label"), col("dim"), col("s").as("sa"),
        col("nd").as("na"))
    val b = sums.filter(col("half") === 1)
      .select(col("label"), col("dim"), col("s").as("sb"),
        col("nd").as("nb"))
    a.join(b, Seq("label", "dim"))
      .withColumn("dnum", col("na") * col("sb") - col("nb") * col("sa"))
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("dnum").cast("decimal(38,0)") *
          col("dnum").cast("decimal(38,0)")).cast("double")
          .as("shift_sq_num"))
      .select(col("label"), col("n_a"), col("n_b"), col("shift_sq_num"),
        (sqrt(col("shift_sq_num")) /
          (col("n_a") * col("n_b")).cast("double")).as("drift"))
  }

  val centroidDriftSql: String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |lab AS (SELECT n.vec_id, n.qv, e2.label,
       |    (${Hashing.idHashSql("n.vec_id")}) % 2 AS half
       |  FROM n JOIN embeddings e2 ON n.vec_id = e2.vec_id),
       |d AS (SELECT label, half,
       |    CAST(unnest(generate_series(1, len(qv))) - 1 AS BIGINT) AS dim,
       |    unnest(qv) AS qx
       |  FROM lab),
       |s AS (SELECT label, half, dim, CAST(SUM(qx) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS nd
       |  FROM d GROUP BY 1, 2, 3),
       |ab AS (SELECT a.label, a.dim,
       |    a.nd AS na, b.nd AS nb,
       |    a.nd * b.s - b.nd * a.s AS dnum
       |  FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
       |  WHERE a.half = 0 AND b.half = 1)
       |SELECT label, CAST(MAX(na) AS BIGINT) AS n_a,
       |  CAST(MAX(nb) AS BIGINT) AS n_b,
       |  CAST(SUM(CAST(dnum AS HUGEINT) * dnum) AS DOUBLE) AS shift_sq_num,
       |  sqrt(CAST(SUM(CAST(dnum AS HUGEINT) * dnum) AS DOUBLE))
       |    / CAST(MAX(na) * MAX(nb) AS DOUBLE) AS drift
       |FROM ab GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_centroid_drift" -> (centroidDrift _),
    "embedding_kmeans" -> (kmeans _),
    "dedup_semantic" -> (semanticDedup _),
    "embedding_outliers" -> (outliers _),
    "cluster_label_purity" -> (labelPurity _),
    "sample_diverse_cells" -> (diverseSample _))

  val oracles: Map[String, String] = Map(
    "embedding_centroid_drift" -> centroidDriftSql,
    "embedding_kmeans" -> kmeansSql,
    "dedup_semantic" -> semanticDedupSql,
    "embedding_outliers" -> outliersSql,
    "cluster_label_purity" -> labelPuritySql,
    "sample_diverse_cells" -> diverseSampleSql)
}
