package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Revenue-concentration (inequality) report: the exact Gini
  * coefficient of per-customer spend within each market segment — the
  * single-number complement of the ABC/Pareto curve (Gini 1912; the
  * rank-sum identity G = (2·Σi·xᵢ − (n+1)·Σxᵢ)/(n·Σxᵢ) over
  * ascending-sorted x). Concentration shifts are how a revenue team
  * notices whale-dependence drift long before a top-k list changes.
  *
  * Exactness: revenue in integer cents; ranks from a total order
  * (revenue, custkey); the coefficient as FLOORED integer micro-units
  * via cleared denominators. The rank-weighted sum 2·Σi·x crosses into
  * decimal(38,0)/HUGEINT before the ×10⁶ scaling (the CUSUM/shape-stats
  * precedent) because n·maxrev·n overflows a Long well inside real
  * customer counts.
  *
  * Scale shape: one fact rollup per customer (map-side combinable),
  * one rank window per segment partition (customer-dim-sized, not
  * fact-sized), one 5-row final agg.
  */
object Gini {

  def revenueGini(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("rev_c"), col("o_custkey"))
    rev
      .withColumn("rank", row_number().over(w).cast("long"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_customers"),
        // The whole numerator chain runs in decimal(38,0): the per-row
        // product rank·rev_c is cast BEFORE summing and the 2·/(n+1)·
        // products stay decimal, matching DuckDB's HUGEINT arithmetic
        // (a previous revision summed in Long, which wraps silently at
        // ~1e6 customers/segment — the round-9 advisor's finding).
        sum(col("rev_c").cast("decimal(38,0)")).as("s_sum"),
        sum(col("rank").cast("decimal(38,0)") * col("rev_c")).as("w_sum"))
      .select(col("segment"), col("n_customers"),
        (col("s_sum").cast("double") / 100.0).as("revenue"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0))
                 * (CAST(2 AS DECIMAL(38,0))*w_sum
                    - (CAST(n_customers AS DECIMAL(38,0))+1)*s_sum))
                div (CAST(n_customers AS DECIMAL(38,0)) * s_sum)
                AS LONG)""").as("gini_e6"))
  }

  val revenueGiniSql: String =
    """WITH rev AS (
      |  SELECT c_mktsegment AS segment, o_custkey,
      |    SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_c
      |  FROM orders, customer WHERE o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (SELECT segment, rev_c,
      |    CAST(row_number() OVER (PARTITION BY segment
      |      ORDER BY rev_c, o_custkey) AS BIGINT) AS rank
      |  FROM rev)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(rev_c) AS DOUBLE)/100.0 AS revenue,
      |  -- rank*rev_c crosses into HUGEINT PER ROW (not just at the SUM):
      |  -- a checked-BIGINT per-row product aborts at very large segments
      |  -- where the Spark side's decimal(38,0) path succeeds (r10 advisory;
      |  -- same fix as Rfm).
      |  CAST(CAST(1000000 AS HUGEINT)
      |      * (2*SUM(CAST(rank AS HUGEINT)*rev_c) - (COUNT(*)+1)*SUM(rev_c))
      |    // (CAST(COUNT(*) AS HUGEINT) * SUM(rev_c)) AS BIGINT)
      |    AS gini_e6
      |FROM ranked GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_revenue_gini" -> (revenueGini _))

  val oracles: Map[String, String] = Map(
    "orders_revenue_gini" -> revenueGiniSql)
}
