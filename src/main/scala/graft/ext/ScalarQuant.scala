package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar (int8) quantization of the embedding corpus — the OTHER
  * compression every production vector store ships next to PQ
  * ([[ProductQuant]]): per-dimension affine mapping of each float to one
  * byte, a 4× memory cut with near-zero recall loss at high dimension.
  * PQ buys 8× at the cost of a codebook lookup per distance; SQ keeps
  * distances directly computable on the codes — which one an index uses
  * is a deployment dial, so the engine provides both, with measured (not
  * claimed) distortion.
  *
  * Code rule, on [[Similarity]]'s shared integer quantization (floats →
  * Longs at scale 10⁴, the frame both engines replay bit-identically):
  *
  *   code_d(v) = (v − lo_d) · 255 div (hi_d − lo_d)   (0 if hi_d = lo_d)
  *
  * where [lo_d, hi_d] is the dimension's exact corpus min/max. The
  * reconstruction error is kept EXACT by clearing the /255 denominator
  * instead of reconstructing a fractional value:
  *
  *   err255_d = 255·(v − lo_d) − code_d · (hi_d − lo_d)  ∈ [0, hi_d − lo_d)
  *
  * — a pure integer residual, so distortion sums are bit-identical in
  * both engines (the PQ report's discipline). err255² < (4·10⁴)² per
  * dim, ×64 dims ≈ 10¹¹ per vector: corpus sums Long-safe to ~9·10⁷
  * vectors, DECIMAL(38) beyond.
  *
  * Scale shape: one posexplode fan-out (×64 map work), ONE 64-row
  * min/max agg (map-side partial, broadcast back — the
  * `embedding_dim_stats` shape), then two keyed aggs. The range frame is
  * CONSTANT-size at any corpus scale; nothing quadratic anywhere.
  *
  * Gates: `embedding_sq_report` (per-dim range, code occupancy, total
  * distortion — the "are all 256 buckets earning their bits" audit) and
  * `embedding_sq_codes` (per-vector payload: the first SEVEN bytes of
  * the code row packed little-endian — 7 × 8 = 56 bits, the widest
  * byte-packed word a SIGNED Long carries without overflow under ANSI
  * arithmetic (a full 8-byte pack is unsigned-64 territory); the full
  * 64-byte row is the binary index payload and arrays cannot cross the
  * driver's compare — plus the vector's exact total distortion).
  */
object ScalarQuant {

  /** Dims packed into the `code_w0` sample word: 7 bytes = 56 bits. */
  private val PackDims = 7

  /** (vec_id, dim, v, lo, hi, code, err255) over a (vec_id, qv) frame —
    * the testable seam (specs feed synthetic vectors with known
    * extremes). */
  private[graft] def codedOf(q: DataFrame): DataFrame = {
    val vals = q
      .select(col("vec_id"), posexplode(col("qv")))
      .toDF("vec_id", "dim", "v")
    val ranges = vals.groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    vals.join(broadcast(ranges), Seq("dim"))
      .withColumn("code",
        when(col("hi") === col("lo"), 0L)
          .otherwise(expr("(v - lo) * 255 div (hi - lo)")))
      .withColumn("err255", (col("v") - col("lo")) * 255 -
        col("code") * (col("hi") - col("lo")))
  }

  private def coded(spark: SparkSession, sfDir: String): DataFrame =
    codedOf(Similarity.quantized(spark, sfDir))

  private val codedSqlCte: String =
    s"""${Similarity.quantizedSqlCte},
       |sqv AS (SELECT vec_id, unnest(qv) AS v,
       |  unnest(range(0, len(qv))) AS dim FROM e),
       |sqr AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM sqv GROUP BY dim),
       |sqc AS (SELECT vec_id, sqv.dim, v, lo, hi,
       |  CASE WHEN hi = lo THEN 0
       |       ELSE (v - lo) * 255 // (hi - lo) END AS code,
       |  (v - lo) * 255 - (CASE WHEN hi = lo THEN 0
       |       ELSE (v - lo) * 255 // (hi - lo) END) * (hi - lo) AS err255
       |  FROM sqv JOIN sqr ON sqv.dim = sqr.dim)""".stripMargin

  /** Per-dimension audit: exact range, how many of the 256 codes are
    * actually used, and the dimension's total squared residual — 64 rows
    * at any corpus scale. */
  def sqReport(spark: SparkSession, sfDir: String): DataFrame =
    coded(spark, sfDir)
      .groupBy(col("dim").cast("long").as("dim"), col("lo"), col("hi"))
      .agg(countDistinct(col("code")).as("n_codes_used"),
        sum(col("err255") * col("err255")).as("sum_err255_sq"))

  val sqReportSql: String =
    s"""WITH $codedSqlCte
       |SELECT CAST(dim AS BIGINT) AS dim, lo, hi,
       |  CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes_used,
       |  CAST(SUM(err255 * err255) AS BIGINT) AS sum_err255_sq
       |FROM sqc GROUP BY dim, lo, hi""".stripMargin

  /** Per-vector payload: first [[PackDims]] dims packed as one
    * little-endian code word + the vector's exact total squared
    * residual. */
  def sqCodes(spark: SparkSession, sfDir: String): DataFrame =
    coded(spark, sfDir)
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("dim") < PackDims,
          expr("shiftleft(code, CAST(8 * dim AS INT))")).otherwise(0L))
          .as("code_w0"),
        sum(col("err255") * col("err255")).as("err255_sq"))

  val sqCodesSql: String =
    s"""WITH $codedSqlCte
       |SELECT vec_id,
       |  CAST(SUM(CASE WHEN dim < $PackDims THEN code * (1::BIGINT << (8 * dim))
       |    ELSE 0 END) AS BIGINT) AS code_w0,
       |  CAST(SUM(err255 * err255) AS BIGINT) AS err255_sq
       |FROM sqc GROUP BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_sq_report" -> (sqReport _),
    "embedding_sq_codes" -> (sqCodes _))

  val oracles: Map[String, String] = Map(
    "embedding_sq_report" -> sqReportSql,
    "embedding_sq_codes" -> sqCodesSql)
}
