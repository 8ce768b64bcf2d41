package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact higher-order distribution moments — skewness and excess
  * kurtosis of the quantity distribution per (returnflag, linestatus)
  * cell, the "is this distribution actually normal enough for my
  * z-score alarms?" audit that sits upstream of every
  * mean/stddev-based gate in the engine ([[Events.hourlyAnomaly]],
  * the quality score bands).
  *
  * One pass accumulates the four power sums S1..S4 of the integer
  * quantity units; the central-moment numerators come from the
  * closed forms with CLEARED denominators (k-th row = n^k · m_k):
  *
  *   m2n = n·S2 − S1²                                   (= n²·m2)
  *   m3n = n²·S3 − 3n·S1·S2 + 2·S1³                     (= n³·m3)
  *   m4n = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴        (= n⁴·m4)
  *
  * so every input to the terminal float math is an exact integer.
  * The dimensionless shape statistics then cancel all the n powers:
  * g1 = m3/m2^1.5 = m3n/m2n^1.5 and g2 = m4/m2² − 3 = m4n/m2n² − 3 —
  * each a handful of correctly-rounded IEEE ops (÷, ×, sqrt — no
  * libm log/pow) on identical integers, so both engines emit
  * bit-identical doubles.
  *
  * Width discipline: S1 fits a Long, but m4n ≈ n⁴·q̄⁴ ≈ 1e29 at
  * sf0.1 — the numerators accumulate in decimal(38,0) (HUGEINT on
  * the oracle side, same 128-bit headroom) and are EMITTED as
  * doubles. The JVM's decimal→double conversion is correctly rounded
  * (BigInteger.doubleValue); DuckDB's direct hugeint→double is NOT
  * (it double-rounds via the 64-bit halves — the round-10 sf1 audit
  * caught a 1-ulp m3n divergence), so the oracle routes the cast
  * through VARCHAR (strtod, correctly rounded) to match bit-for-bit. A 100 TB
  * run (n ≈ 1e11 per cell ⇒ n³·S4 ≈ 1e59) splits each cell into
  * sub-aggregated shards whose decimal moments merge by the same
  * closed forms — the plan shape (one map-side-combinable groupBy)
  * is unchanged.
  *
  * Scale shape: ONE aggregate over the fact scan, map-side
  * combinable; output is the 2×2-ish flag/status grid. */
object Moments {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  def shapeStats(spark: SparkSession, sfDir: String): DataFrame = {
    val q = round(col("l_quantity")).cast("long")
    val s = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), q.as("q"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("s1"),
        sum(dec(col("q") * col("q"))).as("s2"),
        sum(dec(col("q")) * dec(col("q")) * dec(col("q"))).as("s3"),
        sum(dec(col("q")) * dec(col("q")) * dec(col("q")) * dec(col("q")))
          .as("s4"))
    val n = dec(col("n"))
    val s1 = dec(col("s1"))
    val m2n = n * col("s2") - s1 * s1
    val m3n = n * n * col("s3") - lit(3) * n * s1 * col("s2") +
      lit(2) * s1 * s1 * s1
    val m4n = n * n * n * col("s4") - lit(4) * n * n * s1 * col("s3") +
      lit(6) * n * s1 * s1 * col("s2") - lit(3) * s1 * s1 * s1 * s1
    s.withColumn("m2n", m2n.cast("double"))
      .withColumn("m3n", m3n.cast("double"))
      .withColumn("m4n", m4n.cast("double"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("s1").as("sum_q"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean_q"),
        col("m2n"), col("m3n"), col("m4n"),
        when(col("m2n") === 0.0, lit(null))
          .otherwise(col("m3n") / (col("m2n") * sqrt(col("m2n"))))
          .as("skewness"),
        when(col("m2n") === 0.0, lit(null))
          .otherwise(col("m4n") / (col("m2n") * col("m2n")) - 3.0)
          .as("kurtosis"))
  }

  val shapeStatsSql: String =
    """WITH s AS (SELECT l_returnflag, l_linestatus,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
      |    SUM(CAST(CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT) AS HUGEINT)) AS s2,
      |    SUM(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
      |      * CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT)) AS s3,
      |    SUM(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
      |      * CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT)) AS s4
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (SELECT l_returnflag, l_linestatus, n, s1,
      |    CAST(n AS HUGEINT) * s2
      |      - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS m2n,
      |    CAST(n AS HUGEINT) * n * s3
      |      - 3 * CAST(n AS HUGEINT) * s1 * s2
      |      + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS m3n,
      |    CAST(n AS HUGEINT) * n * n * s4
      |      - 4 * CAST(n AS HUGEINT) * n * s1 * s3
      |      + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
      |      - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1 AS m4n
      |  FROM s)
      |-- HUGEINT -> DOUBLE via VARCHAR: DuckDB's direct hugeint cast is
      |-- double-rounded (upper*2^64 + lower, two roundings) and diverged
      |-- from the JVM's correctly-rounded conversion by 1 ulp on the
      |-- sf1 audit's m3n; string->double (strtod) rounds correctly on
      |-- both engines.
      |SELECT l_returnflag, l_linestatus, n, s1 AS sum_q,
      |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
      |  CAST(CAST(m2n AS VARCHAR) AS DOUBLE) AS m2n,
      |  CAST(CAST(m3n AS VARCHAR) AS DOUBLE) AS m3n,
      |  CAST(CAST(m4n AS VARCHAR) AS DOUBLE) AS m4n,
      |  CASE WHEN CAST(CAST(m2n AS VARCHAR) AS DOUBLE) = 0.0 THEN NULL
      |       ELSE CAST(CAST(m3n AS VARCHAR) AS DOUBLE)
      |         / (CAST(CAST(m2n AS VARCHAR) AS DOUBLE)
      |            * sqrt(CAST(CAST(m2n AS VARCHAR) AS DOUBLE)))
      |  END AS skewness,
      |  CASE WHEN CAST(CAST(m2n AS VARCHAR) AS DOUBLE) = 0.0 THEN NULL
      |       ELSE CAST(CAST(m4n AS VARCHAR) AS DOUBLE)
      |         / (CAST(CAST(m2n AS VARCHAR) AS DOUBLE)
      |            * CAST(CAST(m2n AS VARCHAR) AS DOUBLE)) - 3.0
      |  END AS kurtosis
      |FROM m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lineitem_shape_stats" -> (shapeStats _))

  val oracles: Map[String, String] = Map(
    "lineitem_shape_stats" -> shapeStatsSql)
}
