package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental (cross-snapshot) deduplication — the production shape for
  * rolling ingestion at 100 TB. A new batch of documents is deduplicated
  * against the PERSISTED LSH state of a prior corpus snapshot (band
  * buckets + shingle sets), instead of re-running a self-join over the
  * whole union — the self-join redoes O(corpus) work per ingest; this
  * does O(batch) work plus one bucket-keyed join against the snapshot.
  *
  * The snapshot state is two ordinary parquet-able frames
  * ([[Snapshot]]): `(doc_id, band, bh)` buckets and `(doc_id, sh)`
  * shingle sets. It is mergeable — after admission the batch's own
  * frames append to the snapshot for the next increment.
  * IncrementalSpec proves a write→read-back→dedup cycle is identical to
  * the direct dataflow, and that batch-vs-snapshot candidates are
  * exactly the full self-join's candidates restricted to (new × old).
  *
  * Batch membership here is a deterministic hash split
  * (idHash(doc_id) % 4 == 0 → "new", ~25% of the corpus) so both
  * engines replay the same ingest scenario at any SF.
  *
  * Scale: the batch frames are |batch|-sized; the candidate join is an
  * ordinary (band, bh) equi-join — shuffle keyed by bucket, candidates
  * collision-bounded, never all-pairs. One tokenize+shingle pass is
  * shared by every branch via localCheckpoint (the q15/tfidf
  * multi-consumer lineage cut; executor-local, same trade as the bloom
  * sketch — in production each side reads its persisted parquet
  * instead, as the spec's round-trip test demonstrates).
  */
object Incremental {

  private[ext] val BatchMod = 4L

  /** Deterministic batch membership: ~1/BatchMod of docs at any SF. */
  private[graft] def isNew(id: Column): Column =
    Hashing.idHash(id) % BatchMod === 0L

  private[ext] def isNewSql(e: String): String =
    s"((${Hashing.idHashSql(e)}) % $BatchMod = 0)"

  /** The dedup state one corpus side carries: LSH band buckets + shingle
    * sets. For the prior snapshot these are persisted tables; for the
    * new batch they are computed in-flight (and become the next
    * snapshot increment after admission). */
  final case class Snapshot(buckets: DataFrame, shingles: DataFrame)

  private def sideOf(sh: DataFrame, newSide: Boolean): Snapshot = {
    val side = sh.filter(if (newSide) isNew(col("doc_id")) else !isNew(col("doc_id")))
    Snapshot(Dedup.bucketsOf(side), side)
  }

  /** Prior-snapshot state (the ~3/4 "already ingested" docs). */
  def snapshot(spark: SparkSession, sfDir: String): Snapshot =
    sideOf(Dedup.shingled(spark, sfDir), newSide = false)

  /** New-batch state (the ~1/4 "arriving" docs). */
  def batch(spark: SparkSession, sfDir: String): Snapshot =
    sideOf(Dedup.shingled(spark, sfDir), newSide = true)

  /** Candidate (doc_new, doc_old) pairs: the batch's band buckets joined
    * against the snapshot's persisted buckets on (band, bh). */
  def candidatesAgainst(batch: Snapshot, snap: Snapshot): DataFrame =
    batch.buckets.as("n").join(snap.buckets.as("o"),
      col("n.band") === col("o.band") && col("n.bh") === col("o.bh"))
      .select(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
      .distinct()

  /** Exact-Jaccard verify of (doc_new, doc_old) candidates at
    * `threshold`, shingles drawn from each side's own frame. */
  private def verify(cands: DataFrame, batch: Snapshot, snap: Snapshot,
      threshold: Double): DataFrame = {
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    val uni = size(col("sha")).cast("long") + size(col("shb")).cast("long") - inter
    cands
      .join(batch.shingles.select(col("doc_id").as("doc_new"), col("sh").as("sha")), "doc_new")
      .join(snap.shingles.select(col("doc_id").as("doc_old"), col("sh").as("shb")), "doc_old")
      .select(col("doc_new"), col("doc_old"),
        (inter.cast("double") / uni.cast("double")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Verified near-dup pairs of a batch against a snapshot state —
    * candidates from the bucket join, refined by exact shingle-Jaccard
    * at 0.8 (the same kernel as [[Dedup.minhashLsh]]). */
  def pairsAgainst(batch: Snapshot, snap: Snapshot): DataFrame =
    verify(candidatesAgainst(batch, snap), batch, snap, 0.8)

  /** Gated: new-batch × prior-snapshot verified near-dup pairs. */
  def incrementalPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shingled(spark, sfDir).localCheckpoint()
    pairsAgainst(sideOf(sh, newSide = true), sideOf(sh, newSide = false))
  }

  /** Within-batch verified near-dup pairs, oriented (doc_new = larger =
    * rejected, doc_old = smaller = first-wins keeper): an arriving batch
    * still self-dedups before admission. */
  private def withinBatchPairs(batch: Snapshot): DataFrame = {
    val b = batch.buckets
    val cands = b.as("x").join(b.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("doc_new"), col("x.doc_id").as("doc_old"))
      .distinct()
    verify(cands, batch, batch, 0.8)
  }

  /** Gated: doc_ids of new-batch docs ADMITTED to the corpus — those
    * with no verified near-dup in the prior snapshot and no verified
    * near-dup among smaller-id batch docs (first-wins within a batch).
    * This is the operator a rolling ingest actually calls: its
    * complement is the reject log, and the admitted docs' bucket/shingle
    * frames are the next snapshot increment. */
  def admitted(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shingled(spark, sfDir).localCheckpoint()
    val nb = sideOf(sh, newSide = true)
    val snap = sideOf(sh, newSide = false)
    val rejected = pairsAgainst(nb, snap).select(col("doc_new"))
      .union(withinBatchPairs(nb).select(col("doc_new")))
      .distinct().withColumnRenamed("doc_new", "doc_id")
    Tables.documents(spark, sfDir)
      .filter(isNew(col("doc_id")))
      .select(col("doc_id"))
      .join(rejected, Seq("doc_id"), "left_anti")
  }

  /** Containment threshold for the cross-snapshot quote detector. */
  private val ContTauPermille = 900L

  /** Cross-snapshot containment — arriving docs that are ≥0.9 CONTAINED
    * in some already-ingested doc: the rolling-ingest quote/re-post
    * detector ([[Dedup.containmentJoin]]'s asymmetric case, which the
    * Jaccard-verified [[incrementalPairs]] structurally misses when the
    * container is much larger). Candidates are the batch side's
    * rarest-first prefixes joined against the snapshot's inverted
    * index — the prefix principle holds under ANY fixed token order, so
    * computing the df order on the batch alone (O(batch), the whole
    * point of incremental state) loses no recall, only some pruning
    * power. Verify is the exact two-pointer intersect. */
  def incrementalContainment(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shingled(spark, sfDir)
      .filter(size(col("sh")) > 0).localCheckpoint()
    val newSh = sh.filter(isNew(col("doc_id")))
    val oldSh = sh.filter(!isNew(col("doc_id")))
    val cands = Dedup.prefixTokensOf(newSh, ContTauPermille)
      .select(col("doc_id").as("doc_new"), col("h"))
      .join(oldSh.select(col("doc_id").as("doc_old"),
        explode(col("sh")).as("h")), Seq("h"))
      .select(col("doc_new"), col("doc_old")).distinct()
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    cands
      .join(newSh.select(col("doc_id").as("doc_new"), col("sh").as("sha")),
        "doc_new")
      .join(oldSh.select(col("doc_id").as("doc_old"), col("sh").as("shb")),
        "doc_old")
      .select(col("doc_new"), col("doc_old"), inter.as("inter"),
        size(col("sha")).cast("long").as("n_new"),
        size(col("shb")).cast("long").as("n_old"))
      .filter(col("inter") * 1000L >= lit(ContTauPermille) * col("n_new"))
      .withColumn("cont_permille", expr("inter * 1000 div n_new"))
  }

  /** Brute force: every (new, old) token-sharing pair, no pruning. */
  val incrementalContainmentSql: String =
    s"""WITH ${Dedup.bandsSqlCtes},
       |shnz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |u AS (SELECT doc_id, unnest(sh) AS h FROM shnz),
       |pairs AS (SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM u a JOIN u b ON a.h = b.h
       |  WHERE ${isNewSql("a.doc_id")} AND NOT ${isNewSql("b.doc_id")}
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shnz)
       |SELECT doc_new, doc_old, inter, sa.n AS n_new, sb.n AS n_old,
       |  (inter * 1000) // sa.n AS cont_permille
       |FROM pairs
       |JOIN sz sa ON doc_new = sa.doc_id JOIN sz sb ON doc_old = sb.doc_id
       |WHERE inter * 1000 >= $ContTauPermille * sa.n""".stripMargin

  private def jacSql(a: String, b: String): String =
    s"CAST(len(list_intersect($a.sh, $b.sh)) AS DOUBLE) / " +
      s"CAST(len($a.sh) + len($b.sh) - len(list_intersect($a.sh, $b.sh)) AS DOUBLE)"

  val incrementalPairsSql: String =
    s"""WITH ${Dedup.bandsSqlCtes},
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_new, y.doc_id AS doc_old
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  WHERE ${isNewSql("x.doc_id")} AND NOT ${isNewSql("y.doc_id")})
       |SELECT doc_new, doc_old, ${jacSql("a", "b")} AS jac
       |FROM cands JOIN sh a ON a.doc_id = doc_new JOIN sh b ON b.doc_id = doc_old
       |WHERE ${jacSql("a", "b")} >= 0.8""".stripMargin

  val admittedSql: String =
    s"""WITH ${Dedup.bandsSqlCtes},
       |xv AS (
       |  SELECT DISTINCT x.doc_id AS doc_new
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |  JOIN sh a ON a.doc_id = x.doc_id JOIN sh b ON b.doc_id = y.doc_id
       |  WHERE ${isNewSql("x.doc_id")} AND NOT ${isNewSql("y.doc_id")}
       |    AND ${jacSql("a", "b")} >= 0.8),
       |wv AS (
       |  SELECT DISTINCT y.doc_id AS doc_new
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  JOIN sh a ON a.doc_id = x.doc_id JOIN sh b ON b.doc_id = y.doc_id
       |  WHERE ${isNewSql("x.doc_id")} AND ${isNewSql("y.doc_id")}
       |    AND ${jacSql("a", "b")} >= 0.8)
       |SELECT doc_id FROM documents
       |WHERE ${isNewSql("doc_id")}
       |  AND doc_id NOT IN (SELECT doc_new FROM xv)
       |  AND doc_id NOT IN (SELECT doc_new FROM wv)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> (incrementalPairs _),
    "dedup_incremental_admitted" -> (admitted _),
    "dedup_incremental_containment" -> (incrementalContainment _))

  val oracles: Map[String, String] = Map(
    "dedup_incremental" -> incrementalPairsSql,
    "dedup_incremental_admitted" -> admittedSql,
    "dedup_incremental_containment" -> incrementalContainmentSql)
}
