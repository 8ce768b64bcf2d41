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
  *    leave the window), so the exact form EXPLODES each deduplicated
  *    (user, hour) row into its ≤W future spine hours (integer micros
  *    arithmetic) and EQUI-joins the spine — fan-out exactly
  *    |user-hours|·W and an ordinary shuffle-hash join, deliberately
  *    NOT a range join: the range form plans as a broadcast
  *    nested-loop whose per-row probe cost is O(|spine|), which loses
  *    to the bounded explode once the spine is a year of hours. At
  *    100 TB the same spine rides [[Sketches]]' mergeable HLL
  *    registers (`sketch_hll_grouped`) with union-by-window instead —
  *    the documented trade (±2% for O(spine) state), both tiers
  *    gated.
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

  /** Rolling-active windows in hours. INVARIANT (pinned here because
    * the round-9 audit flagged it): the fan-out below explodes each
    * distinct user-hour `Windows.max` times, so the widest window IS
    * the explode factor. 72× over DEDUP'D user-hours is the deliberate
    * trade vs a range join (which plans as a BNLJ with O(|spine|)
    * probes); if a caller ever needs windows past ~an explode factor
    * of a few hundred (say 30 days = 720×), do NOT widen this list —
    * switch that tier to grouped HLL registers with union-by-window
    * (the gated `sketch_hll_grouped_source` machinery, see the header
    * note above), whose state is windows × spine-sized and
    * explode-free. */
  val Windows: Seq[Int] = Seq(6, 24, 72)

  def rollingActives(spark: SparkSession, sfDir: String): DataFrame = {
    val uh = Tables.events(spark, sfDir)
      .select(col("user_id"),
        unix_micros(date_trunc("hour", col("ts")).cast("timestamp"))
          .as("uh_us"))
      .distinct()
      .localCheckpoint() // the fan-out AND the spine derive from it
    val spine = uh.select(col("uh_us").as("hour_us")).distinct()
    val fan = uh
      .select(col("user_id"), col("uh_us"),
        explode(expr(s"sequence(0L, ${Windows.max - 1}L)")).as("off"))
      .select(col("user_id"), col("off"),
        (col("uh_us") + col("off") * lit(3600000000L)).as("hour_us"))
    val aggs = Windows.map { w =>
      countDistinct(when(col("off") < w, col("user_id"))).as(s"rau_${w}h")
    }
    fan.join(spine, "hour_us")
      .groupBy(col("hour_us"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        expr("cast(timestamp_micros(hour_us) as timestamp_ntz)").as("hour") +:
        Windows.map(w => col(s"rau_${w}h").cast("long").as(s"rau_${w}h")) :+
        expr(s"(rau_${Windows.head}h * 1000) div rau_${Windows.max}h")
          .cast("long").as("stickiness_pm"): _*)
  }

  val rollingActivesSql: String = {
    val w0 = Windows.head
    val wMax = Windows.max
    val cols = Windows.map(w =>
      s"""CAST(COUNT(DISTINCT CASE WHEN off < $w
         |    THEN user_id END) AS BIGINT) AS rau_${w}h""".stripMargin)
      .mkString(",\n")
    s"""WITH uh AS (SELECT DISTINCT user_id,
       |    epoch_us(date_trunc('hour', ts)) AS uh_us
       |  FROM events),
       |spine AS (SELECT DISTINCT uh_us AS hour_us FROM uh),
       |fan AS (SELECT user_id, CAST(t.off AS BIGINT) AS off,
       |    uh_us + CAST(t.off AS BIGINT) * 3600000000 AS hour_us
       |  FROM uh, unnest(range(0, $wMax)) AS t(off)),
       |a AS (SELECT hour_us,
       |$cols
       |  FROM fan JOIN spine USING (hour_us) GROUP BY 1),
       |f AS (SELECT make_timestamp(hour_us) AS hour,
       |    rau_${w0}h, rau_24h, rau_${wMax}h,
       |    CAST((rau_${w0}h * 1000) // rau_${wMax}h AS BIGINT)
       |      AS stickiness_pm
       |  FROM a)
       |SELECT * FROM f""".stripMargin
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
