package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space quality evaluation: k-NN majority-vote label
  * prediction (Fix & Hodges 1951 via Cover & Hart 1967). The question a
  * training-data pipeline asks of an embedding column before trusting
  * it for clustering/dedup/sampling decisions: do nearby vectors share
  * labels? Leave-one-out k-NN accuracy over a fixed probe sample is the
  * standard cheap answer, and it doubles as a regression gate on the
  * embedding ingest (a broken normalization or a column swap shows up
  * as accuracy collapse long before downstream jobs degrade).
  *
  * Scale posture: rides [[Similarity.cosinePairs]] — the probe side is
  * the [[QuerySampleN]] vectors with smallest id-hash, CONSTANT-size at
  * any corpus scale, broadcast against the corpus; exact integer dot
  * products (the quantized kernel), one window top-k per probe, integer
  * vote counts with a (votes DESC, label) deterministic argmax. Nothing
  * here grows faster than the corpus scan.
  */
object KnnEval {

  /** Probe-sample size (matches the brute-force kNN audit family). */
  val QuerySampleN = 32

  /** Neighbors consulted per probe. Odd-k is the usual tie-dodge; votes
    * can still tie across 10 labels, so the argmax is order-pinned. */
  val K = 5

  /** Per-probe row: true label, plurality-vote prediction, vote count,
    * hit flag. 32 rows at any SF — the accuracy is the driver-graded
    * mean of `correct`, but per-row output keeps WHICH probes miss
    * visible (a single always-wrong label is a data bug; uniform misses
    * are an embedding bug). */
  def knnLabelVote(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    val nn = Similarity.cosinePairs(spark, sfDir, QuerySampleN)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
    val votes = nn
      .join(labels.withColumnRenamed("vec_id", "nb_id"),
        col("vec_b") === col("nb_id"))
      .groupBy(col("vec_a"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy(col("vec_a"))
      .orderBy(col("votes").desc, col("label"))
    val pred = votes
      .withColumn("r", row_number().over(wv))
      .filter(col("r") === 1)
      .select(col("vec_a"), col("label").as("predicted_label"),
        col("votes"))
    pred.join(labels, col("vec_a") === col("vec_id"))
      .select(col("vec_a"), col("label").as("true_label"),
        col("predicted_label"), col("votes"),
        (col("predicted_label") === col("label")).as("correct"))
  }

  val knnLabelVoteSql: String =
    s"""WITH pairs AS (${Similarity.cosinePairsSql(QuerySampleN)}),
       |nn AS (SELECT vec_a, vec_b FROM (
       |    SELECT vec_a, vec_b, row_number() OVER (PARTITION BY vec_a
       |      ORDER BY cos DESC, vec_b) AS rank FROM pairs)
       |  WHERE rank <= $K),
       |votes AS (SELECT nn.vec_a, CAST(e.label AS BIGINT) AS label,
       |    CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM nn JOIN embeddings e ON nn.vec_b = e.vec_id
       |  GROUP BY 1, 2),
       |pred AS (SELECT vec_a, label AS predicted_label, votes FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_a
       |      ORDER BY votes DESC, label) AS r FROM votes)
       |  WHERE r = 1)
       |SELECT p.vec_a, CAST(e.label AS BIGINT) AS true_label,
       |  p.predicted_label, p.votes,
       |  p.predicted_label = CAST(e.label AS BIGINT) AS correct
       |FROM pred p JOIN embeddings e ON p.vec_a = e.vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_label_vote" -> (knnLabelVote _))

  val oracles: Map[String, String] = Map(
    "knn_label_vote" -> knnLabelVoteSql)
}
