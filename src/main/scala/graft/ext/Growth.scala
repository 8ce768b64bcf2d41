package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Growth analytics — the two reports every product warehouse keeps:
  *
  *  - Rolling active users per hour (the DAU/WAU/MAU family on the
  *    fixture's hourly cadence): EXACT distinct users over trailing
  *    6 h / 24 h / 72 h windows, plus the floored-permille stickiness
  *    ratio (short/long — "of this window's actives, how many were
  *    here today"). Sliding DISTINCT has no prefix-sum identity (users
  *    leave the window), so the exact form is a bounded range join of
  *    the deduplicated (user, hour) frame against the hour spine —
  *    fan-out ≤ |user-hours|·W. That is the exact-tier plan; at
  *    100 TB the same spine rides [[Sketches]]' mergeable HLL registers
  *    (`sketch_hll_grouped`) with union-by-window instead — the
  *    documented trade (±2% for O(spine) state), both tiers gated.
  *  - Cohort LTV: customers cohorted by first-order quarter, revenue
  *    accumulated by cohort age in quarters — the retention-revenue
  *    triangle. Quarter index is the integer year·4 + (quarter−1)
  *    (both engines' year()/quarter() are calendar-exact on
  *    timestamps), money in exact cents.
  *
  * Scale shape: both reports collapse the fact table FIRST (distinct
  * user-hours; per-customer first-order + per-order cents), then join
  * dimension-sized frames. The hour spine and the cohort triangle are
  * dashboard-sized at any SF. */
object Growth {

  val Windows: Seq[Int] = Seq(6, 24, 72)

  def rollingActives(spark: SparkSession, sfDir: String): DataFrame = {
    val uh = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("uhour"))
      .distinct()
      .localCheckpoint() // three window joins + the spine derive from it
    val spine = uh.select(col("uhour").as("hour")).distinct()
    val joined = uh.join(broadcast(spine),
      col("uhour") <= col("hour") &&
        col("uhour") > col("hour") - expr(s"INTERVAL ${Windows.max} HOURS"))
    val aggs = Windows.map { w =>
      countDistinct(when(
        col("uhour") > col("hour") - expr(s"INTERVAL $w HOURS"),
        col("user_id"))).as(s"rau_${w}h")
    }
    joined.groupBy(col("hour"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("hour") +:
        Windows.map(w => col(s"rau_${w}h").cast("long").as(s"rau_${w}h")) :+
        expr(s"(rau_${Windows.head}h * 1000) div rau_${Windows.max}h")
          .cast("long").as("stickiness_pm"): _*)
  }

  val rollingActivesSql: String = {
    val w0 = Windows.head
    val wMax = Windows.max
    val cols = Windows.map(w =>
      s"""CAST(COUNT(DISTINCT CASE WHEN uhour > hour - INTERVAL $w HOURS
         |    THEN user_id END) AS BIGINT) AS rau_${w}h""".stripMargin)
      .mkString(",\n")
    s"""WITH uh AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS uhour
       |  FROM events),
       |spine AS (SELECT DISTINCT uhour AS hour FROM uh),
       |j AS (SELECT s.hour, u.user_id, u.uhour
       |  FROM uh u JOIN spine s
       |    ON u.uhour <= s.hour AND u.uhour > s.hour - INTERVAL $wMax HOURS),
       |a AS (SELECT hour,
       |$cols
       |  FROM j GROUP BY 1)
       |SELECT hour, rau_${w0}h, rau_24h, rau_${wMax}h,
       |  CAST((rau_${w0}h * 1000) // rau_${wMax}h AS BIGINT) AS stickiness_pm
       |FROM a""".stripMargin
  }

  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .cast("long").as("qidx"))
      .localCheckpoint() // first-order cohorts + the revenue fold
    val cohorts = o.groupBy(col("o_custkey"))
      .agg(min(col("qidx")).as("cohort_q"))
    o.join(cohorts, "o_custkey")
      .groupBy(col("cohort_q"), (col("qidx") - col("cohort_q")).as("age_q"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("price_c")).as("revenue_c"))
      .select(col("cohort_q"), col("age_q"), col("n_customers"),
        col("n_orders"),
        (col("revenue_c").cast("double") / 100.0).as("revenue"))
  }

  val cohortLtvSql: String =
    """WITH o AS (SELECT o_custkey, o_orderdate,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
      |    CAST(year(o_orderdate)*4 + quarter(o_orderdate) - 1 AS BIGINT)
      |      AS qidx
      |  FROM orders),
      |c AS (SELECT o_custkey, MIN(qidx) AS cohort_q FROM o GROUP BY 1)
      |SELECT c.cohort_q, o.qidx - c.cohort_q AS age_q,
      |  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(price_c) AS DOUBLE)/100.0 AS revenue
      |FROM o JOIN c ON o.o_custkey = c.o_custkey
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_rolling_actives" -> (rollingActives _),
    "orders_cohort_ltv" -> (cohortLtv _))

  val oracles: Map[String, String] = Map(
    "events_rolling_actives" -> rollingActivesSql,
    "orders_cohort_ltv" -> cohortLtvSql)
}
