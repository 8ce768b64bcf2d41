package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Product quantization (Jégou et al. 2011) over the embedding corpus —
  * the compression half of the IVF-PQ index every billion-vector ANN
  * deployment actually ships (the reference's data model stops at raw
  * vectors; this is the operation that makes them affordable at 100 TB:
  * 64 dims × 4 bytes → a 32-bit code word, a 8× memory cut before any
  * index structure).
  *
  * The vector space is split into [[NumSub]] = 8 contiguous subspaces of
  * [[SubDim]] = 8 dims; each subspace gets a [[CodebookK]] = 16-entry
  * codebook, and a vector's code is the concatenation of its per-subspace
  * argmin-distance centroid ids — 8 × 4 bits packed into one Long. The
  * codebooks reuse the IVF quantizer's rule ([[Similarity]]): a
  * deterministic fixed-size corpus sample (the 16 vectors of smallest
  * idHash), sliced per subspace — trained k-means would move the
  * centroids but not the plan, and a fixed sample keeps the whole
  * codebook a 128-row broadcast replayable in the oracle.
  *
  * Scale shape: subvector fan-out is a per-row map (×8), the codebook
  * join is a broadcast hash join on `sub` (the codebook is CONSTANT-size
  * at any corpus scale — M·K rows), and the argmin window repartitions on
  * (vec_id, sub) once. Distances are exact Longs on [[Similarity]]'s
  * shared integer quantization (|v|² + |c|² − 2⟨v,c⟩ per subspace, ties
  * to the smaller code), so assignments are bit-identical across engines
  * and partitionings. Per-subspace distance ≤ 8·(2·10⁴)² ≈ 3.2e9 and the
  * corpus-total error sum fits Long to ~2.9e9 vectors; DECIMAL(38)
  * beyond.
  *
  * Two gates: `embedding_pq_codes` (per-vector packed code word + exact
  * reconstruction error — the index payload itself) and
  * `embedding_pq_report` (per (subspace, code) occupancy + distortion —
  * the codebook-balance audit run before an index ships; a dead or
  * overloaded code means the quantizer wastes bits).
  */
object ProductQuant {

  /** 8 subspaces × 8 dims = the 64-dim corpus vectors. */
  private val NumSub = 8
  private val SubDim = 8

  /** 16 centroids per subspace → 4 bits per sub-code, 32-bit code word. */
  private val CodebookK = 16

  private def sqDistSub(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftFunctions.dotLong(a, a) + GraftFunctions.dotLong(b, b) -
      lit(2L) * GraftFunctions.dotLong(a, b)

  /** (vec_id, sub, sv): each vector sliced into its 8 subvectors. */
  private def subvectors(base: DataFrame): DataFrame =
    base
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(NumSub - 1))).as("sub"), col("qv"))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        slice(col("qv"), col("sub") * SubDim + 1, lit(SubDim)).as("sv"))

  /** (sub, code, cv): the per-subspace codebooks — slices of the 16
    * smallest-idHash corpus vectors, code = rank in that order. A
    * constant 128-row frame, always broadcast. */
  private def codebooks(base: DataFrame): DataFrame = {
    val seedOrder = Window.orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
    val seeds = base
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
      .limit(CodebookK)
      .withColumn("code", row_number().over(seedOrder).cast("long") - 1L)
    subvectors(seeds.select(col("vec_id"), col("qv")))
      .join(seeds.select(col("vec_id"), col("code")), "vec_id")
      .select(col("sub"), col("code"), col("sv").as("cv"))
  }

  /** Per-(vector, subspace) winning code over ANY (vec_id, qv) frame
    * (codebooks derived from the same frame): argmin exact squared L2,
    * ties to the smaller code id. One broadcast join + one
    * (vec_id, sub) window exchange. */
  private def assignOf(vecs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dist"), col("code"))
    subvectors(vecs)
      .join(broadcast(codebooks(vecs)), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        sqDistSub(col("sv"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("code"), col("dist"))
  }

  private def assignments(spark: SparkSession, sfDir: String): DataFrame =
    assignOf(Similarity.quantized(spark, sfDir))

  /** Per-vector PQ payload: the packed 32-bit code word (sub m's code in
    * bits [4m, 4m+4)) and the exact total reconstruction error. */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame =
    assignments(spark, sfDir)
      .groupBy(col("vec_id"))
      .agg(
        sum(expr("shiftleft(code, CAST(4 * sub AS INT))")).as("code_word"),
        sum(col("dist")).as("recon_err"))

  /** Codebook-balance audit: per (subspace, code) assignment count and
    * total distortion — M·K rows at any corpus scale. */
  def pqReport(spark: SparkSession, sfDir: String): DataFrame =
    assignments(spark, sfDir)
      .groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("dist")).as("total_err"))

  /** The PQ assignment CTE chain over source CTE `src`, all names
    * prefixed with `p` — stated once so the raw-vector oracles
    * (src = n, p = "") and the residual oracle (src = resid, p = "r")
    * are provably the same kernel. */
  private def assignSqlCteFor(src: String, p: String): String = {
    val ih = Hashing.idHashSql("vec_id")
    s"""${p}cbseed AS (SELECT vec_id, qv,
       |    row_number() OVER (ORDER BY $ih, vec_id) - 1 AS code
       |  FROM $src ORDER BY $ih, vec_id LIMIT $CodebookK),
       |${p}subs AS (SELECT vec_id, CAST(t.m AS BIGINT) AS sub,
       |    qv[t.m*$SubDim+1 : t.m*$SubDim+$SubDim] AS sv
       |  FROM $src, range(0, $NumSub) t(m)),
       |${p}csubs AS (SELECT CAST(t.m AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       |    qv[t.m*$SubDim+1 : t.m*$SubDim+$SubDim] AS cv
       |  FROM ${p}cbseed, range(0, $NumSub) t(m)),
       |${p}pqd AS (SELECT v.vec_id, v.sub, c.code,
       |    CAST(list_sum(list_transform(range(1, $SubDim + 1),
       |      i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]))) AS BIGINT) AS dist
       |  FROM ${p}subs v JOIN ${p}csubs c ON v.sub = c.sub),
       |${p}pqa AS (SELECT vec_id, sub, code, dist FROM (
       |    SELECT vec_id, sub, code, dist,
       |      row_number() OVER (PARTITION BY vec_id, sub
       |        ORDER BY dist, code) AS rn
       |    FROM ${p}pqd) WHERE rn = 1)""".stripMargin
  }

  private val assignSqlCte: String = assignSqlCteFor("n", "")

  // ------------------------------------------------------- residual PQ

  /** Each vector minus its assigned k-means MEAN centroid — the input
    * of true IVFADC (Jégou et al. 2011 §III): residuals against means
    * concentrate around the origin (within-cell spread < total spread
    * by the argmin assignment), so the same codebook budget spends its
    * 4 bits/subspace on a tighter distribution and distortion drops —
    * measured by the spec as Σ residual err < Σ raw err, not claimed.
    * Mean centroids matter: residuals against the COSINE-sampled IVF
    * quantizer widen instead (near-orthogonal high-dim vectors give
    * |v−c|² ≈ |v|²+|c|²), which is why real IVFADC trains its coarse
    * quantizer with k-means. Exact Long elementwise difference; the
    * K mean centroids ride a broadcast. */
  private def residuals(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = Clustering.finalAssign(spark, sfDir)
      .select(col("vec_id"), col("qv"), col("cid"))
    val cent = Clustering.finalCentroids(spark, sfDir)
      .select(col("cid"), col("cqv"))
    assigned.join(broadcast(cent), "cid")
      .select(col("vec_id"),
        zip_with(col("qv"), col("cqv"), (a, b) => a - b).as("qv"))
  }

  /** Per-(subspace, code) occupancy + exact distortion of the RESIDUAL
    * codebooks — the report shape of [[pqReport]] over the encoding an
    * IVFADC index actually stores. M·K rows at any scale; the residual
    * pass adds one broadcast centroid join to the raw pipeline. */
  def pqResidualReport(spark: SparkSession, sfDir: String): DataFrame =
    assignOf(residuals(spark, sfDir))
      .groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("dist")).as("total_err"))

  lazy val pqResidualReportSql: String = // lazy: Clustering's CTE chain
    s"""WITH ${Clustering.assignSqlCtes},
       |resid AS (SELECT a.vec_id,
       |    list_transform(range(1, len(a.qv)+1), i -> a.qv[i] - c.cqv[i]) AS qv
       |  FROM a2 a JOIN cent1n c ON a.cid = c.cid),
       |${assignSqlCteFor("resid", "r")}
       |SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n_assigned,
       |  CAST(SUM(dist) AS BIGINT) AS total_err
       |FROM rpqa GROUP BY sub, code""".stripMargin

  // ------------------------------------------------------------ IVF-PQ

  /** ADC shortlist width: how many PQ-scored candidates per query
    * survive to exact rerank. At 100 TB this is THE knob that makes ANN
    * affordable — the full-precision vectors are touched for only W
    * rows per query while the cell scan runs entirely on 32-bit codes. */
  private val ShortlistW = 32

  /** IVF-PQ ANN — the deployable 100 TB shape (Jégou et al. 2011):
    * coarse IVF cells route candidates ([[Similarity.ivfCandidates]],
    * same cells and nprobe as `knn_ivf`), candidates are scored by
    * ASYMMETRIC distance (raw query subvectors against the candidate's
    * 128-row broadcast codebook reconstruction — the candidate's raw
    * vector is never read), the ADC top-[[ShortlistW]] per query
    * survive, and exact cosine reranks the shortlist to top-3.
    *
    * Exactness: ADC dot and reconstruction norm are exact Long sums over
    * the shared integer quantization; the shortlist/final orderings are
    * single double divides with ties to the smaller vec_b — bit-identical
    * in DuckDB. Scale shape: the cell equi-join is the only data-sized
    * shuffle; the codes join is keyed on vec_b (the ×8 subspace fan-out
    * collapses map-side in the pair aggregation); the codebook join is
    * broadcast; rerank touches W raw vectors per query. */
  def knnIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    ivfPqTop3(spark, sfDir, _.filter(col("vec_id") % 50 === 0))

  /** Body of [[knnIvfPq]] with the query-set selector injected —
    * [[Similarity.knnRecallAudit]] passes the fixed 32-vector sample so
    * all four ANN methods rank the SAME queries. */
  private[ext] def ivfPqTop3(spark: SparkSession, sfDir: String,
      pickQ: DataFrame => DataFrame): DataFrame = {
    val base = Similarity.quantized(spark, sfDir)
    // (vec_a, qa, na, vec_b): the IVF candidate pairs; qb/nb prune out
    // of the scan — ADC's whole point is not reading candidate vectors.
    val cands = Similarity.ivfCandidates(spark, sfDir, pickQ)
      .select(col("vec_a"), col("qa"), col("na"), col("vec_b"))
    val codes = assignments(spark, sfDir)
      .select(col("vec_id").as("vec_b"), col("sub"), col("code"))
    val adcSub = GraftFunctions.dotLong(
      slice(col("qa"), (col("sub") * SubDim + 1).cast("int"), lit(SubDim)),
      col("cv"))
    val scored = cands
      .join(codes, Seq("vec_b"))
      .join(broadcast(codebooks(base)), Seq("sub", "code"))
      .groupBy(col("vec_a"), col("vec_b"), col("na"))
      .agg(sum(adcSub).as("adc"),
        sum(GraftFunctions.dotLong(col("cv"), col("cv"))).as("rnrm"))
      .withColumn("adc_cos", col("adc").cast("double") /
        sqrt(col("na").cast("double") * col("rnrm").cast("double")))
    val wShort = Window.partitionBy(col("vec_a"))
      .orderBy(col("adc_cos").desc, col("vec_b"))
    val short = scored
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= ShortlistW)
      .select(col("vec_a"), col("vec_b"))
    val a = base.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
      col("nrm").as("na"))
    val b = base.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("nrm").as("nb"))
    val cos = GraftFunctions.dotLong(col("qa"), col("qb")).cast("double") /
      sqrt(col("na").cast("double") * col("nb").cast("double"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    short.join(a, "vec_a").join(b, "vec_b")
      .select(col("vec_a"), col("vec_b"), cos.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  private[ext] def knnIvfPqSqlFor(queryPred: String): String = {
    val cosExpr =
      """CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*c.qv[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE))""".stripMargin
    s"""WITH ${Similarity.quantizedSqlCte},
       |${Similarity.ivfCandsSqlCte(queryPred)},
       |$assignSqlCte,
       |adc AS (SELECT cd.vec_a, cd.vec_b,
       |    CAST(SUM(list_sum(list_transform(range(1, $SubDim + 1),
       |      i -> qa.qv[pa.sub*$SubDim + i] * cb.cv[i]))) AS BIGINT) AS adc,
       |    CAST(SUM(list_sum(list_transform(cb.cv, x -> x*x))) AS BIGINT) AS rnrm
       |  FROM cands cd
       |  JOIN pqa pa ON pa.vec_id = cd.vec_b
       |  JOIN csubs cb ON cb.sub = pa.sub AND cb.code = pa.code
       |  JOIN n qa ON qa.vec_id = cd.vec_a
       |  GROUP BY cd.vec_a, cd.vec_b),
       |short AS (SELECT vec_a, vec_b FROM (
       |    SELECT d.vec_a, d.vec_b,
       |      row_number() OVER (PARTITION BY d.vec_a ORDER BY
       |        CAST(d.adc AS DOUBLE) / sqrt(CAST(q.nrm AS DOUBLE) * CAST(d.rnrm AS DOUBLE)) DESC,
       |        d.vec_b) AS srank
       |    FROM adc d JOIN n q ON q.vec_id = d.vec_a)
       |  WHERE srank <= $ShortlistW)
       |SELECT vec_a, vec_b, cos, rank FROM (
       |  SELECT s.vec_a, s.vec_b,
       |    $cosExpr AS cos,
       |    row_number() OVER (PARTITION BY s.vec_a ORDER BY
       |      $cosExpr DESC, s.vec_b) AS rank
       |  FROM short s JOIN n a ON a.vec_id = s.vec_a
       |               JOIN n c ON c.vec_id = s.vec_b)
       |WHERE rank <= 3""".stripMargin
  }

  val knnIvfPqSql: String = knnIvfPqSqlFor("q.vec_id % 50 = 0")

  val pqCodesSql: String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |$assignSqlCte
       |SELECT vec_id,
       |  CAST(SUM(code << CAST(4 * sub AS INT)) AS BIGINT) AS code_word,
       |  CAST(SUM(dist) AS BIGINT) AS recon_err
       |FROM pqa GROUP BY vec_id""".stripMargin

  val pqReportSql: String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |$assignSqlCte
       |SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n_assigned,
       |  CAST(SUM(dist) AS BIGINT) AS total_err
       |FROM pqa GROUP BY sub, code""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_pq_codes" -> (pqCodes _),
    "embedding_pq_report" -> (pqReport _),
    "embedding_pq_residual_report" -> (pqResidualReport _),
    "knn_ivfpq" -> (knnIvfPq _))

  val oracles: Map[String, String] = Map(
    "embedding_pq_codes" -> pqCodesSql,
    "embedding_pq_report" -> pqReportSql,
    "embedding_pq_residual_report" -> pqResidualReportSql,
    // Materialized for the same reason as Similarity's IVF oracle: the
    // assignment/codebook CTEs re-expand per reference (sf3: 258 s
    // under a standard compare child). No recursion, no correlated
    // subqueries in the chain.
    "knn_ivfpq" -> Hashing.materializeCtes(knnIvfPqSql))
}
