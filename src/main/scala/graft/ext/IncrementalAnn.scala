package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Incremental IVF index maintenance — the ANN twin of
  * [[Incremental]]'s rolling-ingest dedup (round-15 verdict #3).
  *
  * A production vector index is not rebuilt per ingest: the coarse
  * quantizer (codebook) is FROZEN at snapshot time, new vectors are
  * assigned map-side against the broadcast codebook, and their postings
  * append to the persisted cell state — O(batch) work per ingest versus
  * O(corpus) for a rebuild. The cost of freezing is drift: a codebook
  * trained on the prior corpus routes new vectors slightly worse than a
  * retrained one, and that is priced as the `ivf_incr` row of
  * `knn_recall_audit` (vs the full-rebuild `ivf` row, same queries,
  * same cell caps) rather than assumed away.
  *
  * State is two ordinary parquet-able frames ([[IvfState]]): the
  * 64-row codebook and the (vec_id, cell) postings.
  * IncrementalAnnSpec proves the write→read-back→probe cycle equals the
  * in-flight dataflow, that the frozen codebook contains only prior
  * vectors, and that one ingest adds exactly the batch to the postings.
  *
  * Batch membership is the SAME deterministic hash split as
  * [[Incremental]] (idHash(vec_id) % 4 == 0 → "new"), so both engines
  * replay the identical ingest scenario at any SF.
  *
  * Scale: codebook broadcast is constant-size; assignment is one narrow
  * batch pass; the probe is the standard IVF cell equi-join with
  * [[Similarity.IvfCellCap]]-bounded posting lists — candidates ∝
  * queries × nprobe × cap, linear in the batch. */
object IncrementalAnn {

  /** The persisted index state: codebook (cid, cqv, cnrm) + postings
    * (vec_id, qv, nrm, cell). */
  final case class IvfState(codebook: DataFrame, postings: DataFrame)

  private def isNew = Incremental.isNew(col("vec_id"))

  /** Rank `vecs` against a (broadcast) codebook — rn = 1 is the home
    * cell; queries keep rn ≤ nprobe. One map-side pass at any scale. */
  private[ext] def rankedAgainst(vecs: DataFrame, cb: DataFrame): DataFrame = {
    val ccos = GraftFunctions.dotLong(col("qv"), col("cqv")).cast("double") /
      sqrt(col("nrm").cast("double") * col("cnrm").cast("double"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    vecs.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid"), ccos.as("ccos"))
      .withColumn("rn", row_number().over(w))
  }

  private def assignTo(vecs: DataFrame, cb: DataFrame): DataFrame =
    rankedAgainst(vecs, cb).filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid").as("cell"))

  /** Snapshot-time state: codebook picked from the PRIOR corpus only
    * (the freeze being measured), prior postings assigned against it. */
  def priorState(prior: DataFrame): IvfState = {
    val cb = Similarity.ivfCentroids(prior)
    IvfState(cb, assignTo(prior, cb))
  }

  /** Ingest `batch` into `state`: assign against the frozen codebook,
    * append to postings. The returned state is the next snapshot. */
  def ingest(state: IvfState, batch: DataFrame): IvfState =
    IvfState(state.codebook,
      state.postings.unionByName(assignTo(batch, state.codebook)))

  /** Top-3 neighbors for `pickQ`-selected queries against the state's
    * cell-capped postings — the probe every gate/audit shares. */
  def top3Against(state: IvfState, queries: DataFrame,
      pickQ: DataFrame => DataFrame): DataFrame = {
    val pw = Window.partitionBy(col("cell"))
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
    val capped = state.postings
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= Similarity.IvfCellCap).drop("prn")
      .select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("nrm").as("nb"), col("cell"))
    val q = pickQ(rankedAgainst(queries, state.codebook)
      .filter(col("rn") <= Similarity.IvfNprobe))
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nrm").as("na"), col("cid").as("cell"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    q.join(capped, Seq("cell")).filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"), Similarity.cosCol.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  /** The post-ingest index over any quantized frame, `pickQ` selecting
    * the audit/workload query set — shared by the gate and the recall
    * audit so both price the same frozen-codebook index.
    *
    * Fused plan: `priorState` + `ingest` + a separate query ranking is
    * three broadcast-rank passes over the same corpus; since old and
    * new vectors assign against the SAME frozen codebook, ONE ranking
    * of the whole corpus serves postings (rn = 1) and queries
    * (rn ≤ nprobe) alike — the [[Similarity.ivfCandidates]] shape. The
    * unfused path stays as the persisted-state API
    * ([[priorState]]/[[ingest]]/[[top3Against]]), which
    * IncrementalAnnSpec proves probe-identical. */
  private[ext] def ingestedTop3(spark: SparkSession, sfDir: String,
      queryPick: DataFrame => DataFrame): DataFrame = {
    // One lineage cut on the shared ranking (its two consumers — capped
    // postings and the query side — prune differently); measured
    // faster than both the cut-free form and the 3-pass unfused form.
    val base = Similarity.quantized(spark, sfDir)
    val cb = Similarity.ivfCentroids(base.filter(!isNew))
    val ranked = rankedAgainst(base, cb)
      .filter(col("rn") <= Similarity.IvfNprobe).localCheckpoint()
    val pw = Window.partitionBy(col("cell"))
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
    val capped = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cid").as("cell"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= Similarity.IvfCellCap)
      .select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("nrm").as("nb"), col("cell"))
    val q = queryPick(ranked)
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nrm").as("na"), col("cid").as("cell"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    q.join(capped, Seq("cell")).filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"), Similarity.cosCol.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  /** Gated: every NEW-batch vector queried against the just-ingested
    * index (the query-on-ingest shape a rolling pipeline runs). */
  def knnIvfIncremental(spark: SparkSession, sfDir: String): DataFrame =
    ingestedTop3(spark, sfDir, _.filter(isNew))

  /** Audit arm: the standard 32-vector corpus sample against the same
    * post-ingest index — comparable 1:1 with the full-rebuild `ivf`
    * audit row. */
  private[ext] def auditTop3(spark: SparkSession, sfDir: String,
      pickQ: DataFrame => DataFrame): DataFrame =
    ingestedTop3(spark, sfDir, pickQ)

  // ------------------------------------------------------------- oracle

  /** `ranked`-style CTE over a source CTE: rank `src` rows against
    * `cent`. */
  private def rankedSql(name: String, src: String): String =
    s"""$name AS (
       |    SELECT $src.vec_id, $src.qv, $src.nrm, icent.cid,
       |      row_number() OVER (PARTITION BY $src.vec_id ORDER BY
       |        CAST(CAST(list_sum(list_transform(range(1, len($src.qv)+1), i -> $src.qv[i]*icent.cqv[i])) AS BIGINT) AS DOUBLE)
       |          / sqrt(CAST($src.nrm AS DOUBLE) * CAST(icent.cnrm AS DOUBLE)) DESC, icent.cid) AS rn
       |    FROM $src, icent)""".stripMargin

  /** Shared ingest CTE chain — the fused form: the frozen codebook
    * comes from the prior side only, ONE whole-corpus ranking (irall)
    * serves postings (rn = 1) and queries (rn ≤ nprobe), mirroring
    * [[ingestedTop3]]. */
  private[ext] def ingestSqlCtes: String =
    s"""iold AS (SELECT * FROM n WHERE NOT ${Incremental.isNewSql("vec_id")}),
       |icent AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM iold
       |  ORDER BY ${Hashing.idHashSql("vec_id")}, vec_id LIMIT ${Similarity.IvfNumCentroids}),
       |${rankedSql("irall", "n")},
       |iposting AS (SELECT vec_id, qv, nrm, cell FROM (
       |    SELECT vec_id, qv, nrm, cid AS cell, row_number() OVER (
       |      PARTITION BY cid
       |      ORDER BY ${Hashing.idHashSql("vec_id")}, vec_id) AS prn
       |    FROM irall WHERE rn = 1) z
       |  WHERE prn <= ${Similarity.IvfCellCap})""".stripMargin

  private[ext] def topSqlFor(querySrc: String, queryPred: String): String = {
    val cosExpr =
      """CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*c.qv[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE))""".stripMargin
    s"""SELECT vec_a, vec_b, cos, rank FROM (
       |  SELECT vec_a, vec_b,
       |    $cosExpr AS cos,
       |    row_number() OVER (PARTITION BY vec_a ORDER BY
       |      $cosExpr DESC, vec_b) AS rank
       |  FROM (SELECT q.vec_id AS vec_a, c.vec_id AS vec_b
       |    FROM $querySrc q JOIN iposting c ON q.cid = c.cell
       |    WHERE q.rn <= ${Similarity.IvfNprobe} AND $queryPred AND q.vec_id <> c.vec_id) cands
       |  JOIN n a ON a.vec_id = vec_a JOIN n c ON c.vec_id = vec_b)
       |WHERE rank <= 3""".stripMargin
  }

  val knnIvfIncrementalSql: String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |$ingestSqlCtes
       |${topSqlFor("irall", Incremental.isNewSql("q.vec_id"))}""".stripMargin

  /** Self-contained audit arm (own WITH — the audit embeds each
    * method's chain as an independent subquery): the 32-sample queries
    * against the post-ingest index. */
  private[ext] def auditSqlFor(queryPred: String): String =
    s"""WITH ${Similarity.quantizedSqlCte},
       |$ingestSqlCtes
       |${topSqlFor("irall", queryPred)}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_ivf_incremental" -> (knnIvfIncremental _))

  val oracles: Map[String, String] = Map(
    "knn_ivf_incremental" -> Hashing.materializeCtes(knnIvfIncrementalSql))
}
