package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Forecast-baseline evaluation: seasonal-naive error (Hyndman &
  * Athanasopoulos, "Forecasting: Principles and Practice" — the
  * baseline every model must beat). Prediction for hour t is the count
  * at t − 168 h (same hour last week); the report is the per-day
  * absolute-error mass against actuals. A capacity/anomaly pipeline
  * keeps this number charted: when a "real" model stops beating
  * seasonal-naive, the model is dead weight.
  *
  * Exactness: event counts are Longs; the error is Σ|Δ| per day with an
  * integer-permille rate — no floating point anywhere. Absent hours
  * (no events) are excluded by the inner self-join on the hour spine,
  * stated on both engines.
  *
  * Scale shape: one map-side-combinable hourly rollup (calendar-bounded
  * frame), then a self-equi-join of that tiny frame on hour−168 and a
  * per-day rollup. Nothing fact-sized crosses a shuffle after the
  * first agg.
  */
object Forecast {

  private val SeasonHours = 168L // one week

  def seasonalNaive(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hn",
        datediff(col("hour").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long") * 24L + hour(col("hour")).cast("long"))
    val prev = hourly.select((col("hn") + SeasonHours).as("phn"),
      col("cnt").as("pred"))
    hourly.join(prev, col("hn") === col("phn"))
      .groupBy(date_trunc("day", col("hour")).as("day"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("cnt")).as("actual"),
        sum(abs(col("cnt") - col("pred"))).as("sum_abs_err"))
      .withColumn("err_permille",
        expr("sum_abs_err * 1000 div actual").cast("long"))
  }

  val seasonalNaiveSql: String =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS hour,
       |    CAST(COUNT(*) AS BIGINT) AS cnt,
       |    date_diff('day', DATE '1970-01-01', CAST(date_trunc('hour', ts)
       |      AS DATE)) * 24 + hour(date_trunc('hour', ts)) AS hn
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
       |SELECT date_trunc('day', a.hour) AS day,
       |  CAST(COUNT(*) AS BIGINT) AS n_hours,
       |  CAST(SUM(a.cnt) AS BIGINT) AS actual,
       |  CAST(SUM(ABS(a.cnt - b.cnt)) AS BIGINT) AS sum_abs_err,
       |  CAST(SUM(ABS(a.cnt - b.cnt)) * 1000 // SUM(a.cnt) AS BIGINT)
       |    AS err_permille
       |FROM hourly a JOIN hourly b ON a.hn = b.hn + $SeasonHours
       |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_seasonal_naive" -> (seasonalNaive _))

  val oracles: Map[String, String] = Map(
    "events_seasonal_naive" -> seasonalNaiveSql)
}
