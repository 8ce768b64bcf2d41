package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Exactness across engines: cosine on raw floats is accumulation-order-
  * dependent, so instead vectors are quantized to exact integers
  * (round(x*1e4) — float→double is exact, one IEEE multiply + round is
  * deterministic), dot products and norms are exact Long sums, and the
  * final score is a single double divide + sqrt — bit-identical in Spark
  * and DuckDB. |x| ≤ 0.5 ⇒ |q| ≤ 5000 ⇒ 64-dim dot ≤ 1.6e9, far inside
  * Long range.
  *
  * Scale shapes:
  *  - brute-force top-k: broadcast the (small) query set, nested-loop
  *    against the corpus, per-query window top-k. The corpus side streams;
  *    no all-pairs shuffle. This is the audit/baseline path.
  *  - LSH ANN: 16 random-hyperplane bits (planes derived from integer
  *    hashing — no stored model), bucket equi-join, top-k within bucket.
  *    At 100 TB the bucket join is an ordinary shuffled equi-join on the
  *    16-bit key; recall tunes with plane count / multiple tables.
  */
object Similarity {

  /** (vec_id, qv: array<long>, nrm: long) */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 10000).cast("long")).as("qv"))
      .withColumn("nrm",
        aggregate(transform(col("qv"), v => v * v), lit(0L), (acc, x) => acc + x))

  private val quantizedSqlCte: String =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv FROM embeddings),
      |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nrm FROM e)""".stripMargin

  private def cosCol = {
    val dot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    dot.cast("double") / sqrt(col("na").cast("double") * col("nb").cast("double"))
  }

  /** All (sampled query, corpus) cosine pairs. Query side = vec_id %
    * querySampleMod == 0, broadcast. */
  def cosinePairs(spark: SparkSession, sfDir: String,
      querySampleMod: Int): DataFrame = {
    val all = quantized(spark, sfDir)
    val q = all.filter(col("vec_id") % querySampleMod === 0)
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("nrm").as("na"))
    val c = all.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("nrm").as("nb"))
    c.join(broadcast(q), col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosCol.as("cos"))
  }

  def cosinePairsSql(querySampleMod: Int): String =
    s"""WITH $quantizedSqlCte
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS DOUBLE)
       |    / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS cos
       |FROM n a JOIN n b ON a.vec_id % $querySampleMod = 0 AND a.vec_id <> b.vec_id""".stripMargin

  /** Brute-force top-3 cosine neighbors for each sampled query vector. */
  def knnBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    cosinePairs(spark, sfDir, querySampleMod = 50)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  val knnBruteForceSql: String =
    s"""SELECT vec_a, vec_b, cos, rank FROM (
       |  SELECT vec_a, vec_b, cos,
       |    row_number() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b) AS rank
       |  FROM (${cosinePairsSql(50)}))
       |WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------------- LSH ANN

  /** 16 pseudo-random integer hyperplanes; component d of plane j is
    * ((j*2654435761 + d*40503) % 2047) - 1023 — derived, not stored, and
    * identical in the oracle SQL. */
  private val lshBucketExpr: String =
    """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) ->
      |  acc + CASE WHEN aggregate(sequence(0, 63), CAST(0 AS BIGINT), (a2, d) ->
      |                a2 + element_at(qv, d + 1) * (((j*2654435761 + d*40503) % 2047) - 1023)) > 0
      |             THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)""".stripMargin

  private val lshBucketSql: String =
    """CAST(list_sum(list_transform(range(0, 16), j ->
      |  CASE WHEN list_sum(list_transform(range(0, 64), d ->
      |                qv[CAST(d + 1 AS INTEGER)] * (((j*2654435761 + d*40503) % 2047) - 1023))) > 0
      |       THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin

  /** ANN: same-bucket candidates only, then exact top-3 within bucket.
    * Recall < 1 by construction; the scale path (bucket equi-join instead
    * of corpus broadcast-nested-loop). */
  def knnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketed = quantized(spark, sfDir).withColumn("bucket", expr(lshBucketExpr))
    val q = bucketed.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nrm").as("na"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
      col("nrm").as("nb"), col("bucket"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    q.join(c, Seq("bucket"))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosCol.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
  }

  val knnLshSql: String =
    s"""WITH $quantizedSqlCte,
       |b AS (SELECT vec_id, qv, nrm, $lshBucketSql AS bucket FROM n)
       |SELECT vec_a, vec_b, cos, rank FROM (
       |  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |    CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*c.qv[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cos,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |      CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*c.qv[i])) AS BIGINT) AS DOUBLE)
       |        / sqrt(CAST(a.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) DESC, c.vec_id) AS rank
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id % 50 = 0 AND a.vec_id <> c.vec_id)
       |WHERE rank <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> (knnBruteForce _),
    "knn_lsh" -> (knnLsh _))

  val oracles: Map[String, String] = Map(
    "knn_bruteforce" -> knnBruteForceSql,
    "knn_lsh" -> knnLshSql)
}
