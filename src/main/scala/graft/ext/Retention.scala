package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohort retention — the second classic event-analytics matrix next to
  * the funnel: users are bucketed by first-seen week (their cohort) and
  * counted in every later week they return, giving the
  * (cohort, week-offset) → active-users matrix a retention dashboard
  * plots. Both engines truncate to Monday-start weeks, and the offset
  * is an exact day-difference of truncated dates div 7 — integer
  * arithmetic end to end.
  *
  * Scale shape: one user_id-keyed aggregation chain — cohort = min
  * week per user, activity = distinct (user, week) pairs (map-side
  * combinable: a user's events within a week collapse before the
  * exchange), then activity ⋈ cohort on user_id reuses the clustering
  * and the final matrix agg is O(#cohorts × #offsets) rows. COUNT
  * DISTINCT here is exact but cheap: the distinct ran already, the
  * final agg counts pre-deduplicated rows.
  */
object Retention {

  /** Retention matrix over an arbitrary events frame (user_id, ts). */
  def retentionOf(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = weekly.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort"))
    weekly.join(cohorts, Seq("user_id"))
      .select(col("cohort"),
        expr("cast(datediff(wk, cohort) div 7 as bigint)").as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  def retention(spark: SparkSession, sfDir: String): DataFrame =
    retentionOf(Tables.events(spark, sfDir))

  val retentionSql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(wk) AS cohort FROM weekly GROUP BY 1)
      |SELECT c.cohort,
      |  CAST(date_diff('day', c.cohort, w.wk) // 7 AS BIGINT) AS week_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM weekly w JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_retention" -> (retention _))

  val oracles: Map[String, String] = Map(
    "events_retention" -> retentionSql)
}
