package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket co-occurrence — frequent part PAIRS across orders,
  * the first level of association mining and the workload shape behind
  * "customers also bought". Distinct (order, part) membership, an
  * order-keyed self-join with `part_a < part_b` (each unordered pair
  * once), and a pair-keyed count with minimum support 2.
  *
  * Scale shape: the self-join is an ordinary equi-join on l_orderkey,
  * and its fan-out is C(k,2) per order where k is the ORDER size —
  * bounded by the basket (≤13 items in this corpus, so ≤78 pairs),
  * never corpus-quadratic. The pair count partial-aggregates map-side.
  * On data with unbounded mega-baskets the standard guard is to cap or
  * salt the largest orders before pairing; this corpus needs none.
  */
object Basket {

  val MinSupport = 2L

  def copurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= MinSupport)
  }

  val copurchaseSql: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders
       |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  AND a.l_partkey < b.l_partkey
       |GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parts_copurchase" -> (copurchase _))

  val oracles: Map[String, String] = Map(
    "parts_copurchase" -> copurchaseSql)
}
