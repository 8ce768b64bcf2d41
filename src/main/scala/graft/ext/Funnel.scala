package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ordered funnel analysis (view → click → purchase) with a conversion
  * window — the analytics-product semantics (any entry point, each
  * stage within `WindowMin` of the previous): a click QUALIFIES if any
  * view precedes it within the window; a purchase converts if any
  * QUALIFIED click precedes it within the window; a user's stage is
  * the deepest qualified event they own. Anchoring to the first view
  * only (the naive reading) starves the funnel on sparse streams —
  * this corpus spans months, so the earliest view almost never has a
  * click within any sane window.
  *
  * Scale shape: ONE exchange on user_id serves the whole query. The
  * qualification flags are running maxima over a strict-predecessor
  * RANGE frame (micros orderBy, upper bound −1 — ties excluded, so
  * "strictly earlier" matches the oracle's `<` exactly), stacked over
  * the same partitioning; the per-user collapse reuses the clustering.
  * The oracle states the same semantics as two EXISTS self-joins —
  * clearer spec, three fact shuffles; ours is the plan you'd run.
  */
object Funnel {

  val WindowMin = 120L
  /** Shared with the streaming twin (graft.streaming.Streaming). */
  private[graft] val WMicros = WindowMin * 60L * 1000000L

  /** Stage per user for an arbitrary events frame (user_id, event_type,
    * ts) — the reusable operator; the gates apply it to the corpus. */
  def stagesOf(events: DataFrame): DataFrame = {
    val strictlyBefore = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu")).rangeBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("tsu", unix_micros(col("ts").cast("timestamp")))
      .withColumn("lv",
        max(when(col("event_type") === "view", col("tsu"))).over(strictlyBefore))
      .withColumn("qclick",
        col("event_type") === "click" && col("lv").isNotNull &&
          col("tsu") - col("lv") <= WMicros)
      .withColumn("lqc",
        max(when(col("qclick"), col("tsu"))).over(strictlyBefore))
      .withColumn("qpurch",
        col("event_type") === "purchase" && col("lqc").isNotNull &&
          col("tsu") - col("lqc") <= WMicros)
      .groupBy(col("user_id"))
      .agg(max(
        when(col("qpurch"), 3L)
          .when(col("qclick"), 2L)
          .when(col("event_type") === "view", 1L)
          .otherwise(0L)).as("stage"))
  }

  private def staged(spark: SparkSession, sfDir: String): DataFrame =
    stagesOf(Tables.events(spark, sfDir))

  /** Per-user deepest funnel stage reached (0–3). */
  def funnelUsers(spark: SparkSession, sfDir: String): DataFrame =
    staged(spark, sfDir)

  /** Funnel report: users at each exact stage plus cumulative reach —
    * the numbers a conversion dashboard shows. The reach window runs
    * over ≤4 rows (stage cardinality), never the corpus. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val per = staged(spark, sfDir)
    per.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("n_reached",
        sum(col("n_users")).over(
          Window.orderBy(col("stage").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private val stagedSql: String =
    s"""WITH qc AS (SELECT DISTINCT c.user_id, c.ts FROM events c
       |    JOIN events v ON v.user_id = c.user_id
       |    AND v.event_type = 'view' AND c.event_type = 'click'
       |    AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL $WindowMin MINUTE),
       |  qp AS (SELECT DISTINCT p.user_id FROM events p
       |    JOIN qc ON qc.user_id = p.user_id
       |    AND p.event_type = 'purchase'
       |    AND p.ts > qc.ts AND p.ts <= qc.ts + INTERVAL $WindowMin MINUTE),
       |  hv AS (SELECT DISTINCT user_id FROM events
       |    WHERE event_type = 'view'),
       |  u AS (SELECT DISTINCT user_id FROM events)
       |SELECT u.user_id,
       |  CASE WHEN u.user_id IN (SELECT user_id FROM qp) THEN 3
       |       WHEN u.user_id IN (SELECT user_id FROM qc) THEN 2
       |       WHEN u.user_id IN (SELECT user_id FROM hv) THEN 1
       |       ELSE 0 END AS stage
       |FROM u""".stripMargin

  val funnelUsersSql: String =
    s"SELECT user_id, CAST(stage AS BIGINT) AS stage FROM ($stagedSql)"

  val funnelSql: String =
    s"""SELECT CAST(stage AS BIGINT) AS stage,
       |  CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(COUNT(*)) OVER (ORDER BY stage DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS n_reached
       |FROM ($stagedSql) GROUP BY stage""".stripMargin

  /** Funnel conversion by arrival cohort — "are newer users converting
    * better": each user cohorted by the DAY of their first event, the
    * per-user funnel stage crossed with the cohort, emitted as stage
    * counts + floored-permille conversion (stage ≥ 3) per cohort day.
    * The product question behind every activation dashboard, and the
    * composition seam the stage and cohort frames were built for.
    *
    * Scale shape: first-event day is a map-side-combinable min per
    * user riding the SAME user clustering the stage build uses; the
    * cross tab is cohorts × 4 rows at any SF. */
  def funnelCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val firstDay = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    val st = staged(spark, sfDir)
    val cells = st.join(firstDay, "user_id")
      .groupBy(col("cohort_day"), col("stage"))
      .agg(count(lit(1)).as("n_users"))
    val tot = cells.groupBy(col("cohort_day"))
      .agg(sum(col("n_users")).as("n_cohort"),
        sum(when(col("stage") >= 3, col("n_users")).otherwise(0L))
          .as("n_converted"))
    cells.join(broadcast(tot), "cohort_day")
      .select(col("cohort_day"), col("stage"), col("n_users"),
        col("n_cohort"),
        expr("(n_converted * 1000) div n_cohort").as("conversion_pm"))
  }

  lazy val funnelCohortsSql: String =
    s"""WITH st AS ($stagedSql),
       |fd AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
       |  FROM events GROUP BY 1),
       |cells AS (SELECT fd.cohort_day, CAST(st.stage AS BIGINT) AS stage,
       |    CAST(COUNT(*) AS BIGINT) AS n_users
       |  FROM st JOIN fd USING (user_id) GROUP BY 1, 2),
       |tot AS (SELECT cohort_day, CAST(SUM(n_users) AS BIGINT) AS n_cohort,
       |    CAST(SUM(CASE WHEN stage >= 3 THEN n_users ELSE 0 END) AS BIGINT)
       |      AS n_converted
       |  FROM cells GROUP BY 1)
       |SELECT c.cohort_day, c.stage, c.n_users, t.n_cohort,
       |  (t.n_converted * 1000) // t.n_cohort AS conversion_pm
       |FROM cells c JOIN tot t USING (cohort_day)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_funnel_users" -> (funnelUsers _),
    "events_funnel" -> (funnel _),
    "events_funnel_cohorts" -> (funnelCohorts _))

  val oracles: Map[String, String] = Map(
    "events_funnel_users" -> funnelUsersSql,
    "events_funnel" -> funnelSql,
    "events_funnel_cohorts" -> funnelCohortsSql)
}
