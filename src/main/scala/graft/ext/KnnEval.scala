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

  /** Dimension-truncation dial for retrieval: recall@3 of PREFIX-dim
    * cosine against the full-dim exact top-3, per budget — the
    * Matryoshka question (Kusupati et al. 2022): how many leading
    * dimensions does retrieval actually need? At 100 TB, serving a
    * 16-dim prefix instead of 64 dims is a 4× cut in index bytes and
    * dot-product work, and this gate prices what that costs in recall.
    *
    * One pair frame (constant 32-probe broadcast × corpus), a constant
    * ×|dials| map-side explode, integer dot/norm on the sliced prefix,
    * one window top-3 per (probe, dim), then overlap vs the dim-64 arm
    * (which doubles as the self-audit: its recall row must read 1000).
    */
  val TruncDims: Seq[Int] = Seq(8, 16, 32, 64)

  def knnDimTruncation(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Similarity.quantized(spark, sfDir)
    val q = all.orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
      .limit(QuerySampleN)
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"))
    val c = all.select(col("vec_id").as("vec_b"), col("qv").as("qb"))
    val pairs = c.join(broadcast(q), col("vec_a") =!= col("vec_b"))
      .withColumn("dim", explode(array(TruncDims.map(d => lit(d)): _*)))
      .withColumn("da", expr("slice(qa, 1, dim)"))
      .withColumn("db", expr("slice(qb, 1, dim)"))
      .withColumn("cos",
        graft.functions.GraftFunctions.dotLong(col("da"), col("db"))
          .cast("double") /
          sqrt(graft.functions.GraftFunctions.dotLong(col("da"), col("da"))
            .cast("double") *
            graft.functions.GraftFunctions.dotLong(col("db"), col("db"))
              .cast("double")))
    val w = Window.partitionBy(col("vec_a"), col("dim"))
      .orderBy(col("cos").desc, col("vec_b"))
    val top3 = pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("vec_a"), col("vec_b"), col("dim"))
    val full = top3.filter(col("dim") === TruncDims.max)
      .select(col("vec_a").as("fa"), col("vec_b").as("fb"))
    top3.join(full, col("vec_a") === col("fa") && col("vec_b") === col("fb"),
        "left_semi")
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("hits"))
      .withColumn("recall_permille",
        expr(s"hits * 1000 div (${QuerySampleN * 3})").cast("long"))
  }

  val knnDimTruncationSql: String = {
    def dot(a: String, b: String): String =
      s"CAST(list_sum(list_prepend(0::BIGINT, list_transform(" +
        s"range(1, dim+1), i -> $a[i]*$b[i]))) AS BIGINT)"
    s"""WITH ${Similarity.quantizedSqlCte},
       |q AS (SELECT vec_id, qv FROM n
       |  ORDER BY ${Hashing.idHashSql("vec_id")}, vec_id
       |  LIMIT $QuerySampleN),
       |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, dim,
       |    CAST(${dot("a.qv", "b.qv")} AS DOUBLE)
       |      / sqrt(CAST(${dot("a.qv", "a.qv")} AS DOUBLE)
       |             * CAST(${dot("b.qv", "b.qv")} AS DOUBLE)) AS cos
       |  FROM q a JOIN n b ON a.vec_id <> b.vec_id
       |  CROSS JOIN (VALUES (${TruncDims.mkString("), (")})) t(dim)),
       |top3 AS (SELECT vec_a, vec_b, dim FROM (
       |    SELECT vec_a, vec_b, dim, row_number() OVER (
       |      PARTITION BY vec_a, dim ORDER BY cos DESC, vec_b) AS rank
       |    FROM pairs)
       |  WHERE rank <= 3),
       |full3 AS (SELECT vec_a, vec_b FROM top3
       |  WHERE dim = ${TruncDims.max})
       |SELECT CAST(dim AS BIGINT) AS dim,
       |  CAST(COUNT(*) AS BIGINT) AS hits,
       |  CAST(COUNT(*) * 1000 // ${QuerySampleN * 3} AS BIGINT)
       |    AS recall_permille
       |FROM top3 WHERE EXISTS (SELECT 1 FROM full3 f
       |  WHERE f.vec_a = top3.vec_a AND f.vec_b = top3.vec_b)
       |GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_label_vote" -> (knnLabelVote _),
    "knn_dim_truncation" -> (knnDimTruncation _))

  val oracles: Map[String, String] = Map(
    "knn_label_vote" -> knnLabelVoteSql,
    "knn_dim_truncation" -> knnDimTruncationSql)
}
