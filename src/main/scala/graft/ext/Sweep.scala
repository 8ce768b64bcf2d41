package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval sweep-line analytics: peak concurrency from event streams.
  *
  * The classic "max concurrent sessions" question (capacity planning,
  * license auditing, connection-pool sizing) is a sweep: +1 at each
  * interval start, −1 at each end, running sum, max. The textbook form
  * is a GLOBAL sort over 2·N boundaries — a scale-killer. This
  * implementation is day-partitioned: each day sweeps independently
  * (bounded sort inside one partition) and the cross-midnight state is
  * restored by an exact carry-in count, which the bounded interval
  * length makes cheap — an interval can only span a boundary it starts
  * within [[Sweep.TtlSeconds]] of, so the carry is a filtered count,
  * not an interval join.
  *
  * Tie semantics (pinned, both engines): intervals are half-open
  * [ts, ts+TTL), so an interval ending at instant t does NOT overlap
  * one starting at t — ends apply before starts. Rather than order
  * individual ±1 rows within a tie (running-max would depend on the
  * unspecified permutation), boundaries are pre-aggregated per distinct
  * timestamp into a NET delta; the within-instant maximum is then
  * provably the post-net value, so the sweep over distinct timestamps
  * is permutation-free and deterministic.
  */
object Sweep {

  /** Interval length: each event holds a session slot for 5 minutes. */
  val TtlSeconds = 300

  /** Peak concurrent 5-minute event intervals per day.
    *
    * Plan: two map-side-combinable groupBys collapse boundaries to
    * distinct (day, instant) NET rows; one window cumsum partitioned by
    * day (the only sort, bounded by a day's distinct instants); a
    * per-day max; and a left join of the tiny carry-in frame. Peak =
    * carry + max(0, running-net max) — the day-start concurrency is
    * carry itself, hence the floor at 0. */
  def peakConcurrency(spark: SparkSession, sfDir: String): DataFrame =
    peakOf(Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("ts"),
        (col("ts") + expr(s"INTERVAL $TtlSeconds SECOND")).as("te")))

  /** Sweep kernel over an explicit (ts, te) interval frame — the seam
    * SweepSpec uses to plant boundary-exact midnight ends. */
  private[graft] def peakOf(iv: DataFrame): DataFrame = {
    // An end landing EXACTLY on a midnight belongs to the closing day
    // under half-open [ts, te) — the interval is never alive in
    // day(te) — so boundary-exact ends are dropped from the next day's
    // sweep (and from the carry below); as a trailing -1 at the closing
    // day's last representable instant they could never raise that
    // day's max either. (Round-9 advisory: counting them in the next
    // day inflated carry_in and peak by one per such interval.)
    val boundaries = iv
      .select(date_trunc("day", col("ts")).as("day"), col("ts").as("t"),
        lit(1L).as("net"))
      .union(iv
        .filter(col("te") =!= date_trunc("day", col("te")))
        .select(date_trunc("day", col("te")).as("day"),
          col("te").as("t"), lit(-1L).as("net")))
      .groupBy(col("day"), col("t"))
      .agg(sum(col("net")).as("net"))
    val w = Window.partitionBy(col("day")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = boundaries
      .withColumn("after", sum(col("net")).over(w))
      .groupBy(col("day"))
      .agg(max(col("after")).as("max_after"))
    // Intervals alive at a midnight: they start within TtlSeconds before
    // it, i.e. their end lands on a later day than their start.
    val carry = iv
      .filter(date_trunc("day", col("ts")) =!= date_trunc("day", col("te"))
        && col("te") =!= date_trunc("day", col("te")))
      .groupBy(date_trunc("day", col("te")).as("day"))
      .agg(count(lit(1)).as("carry_in"))
    perDay.join(carry, Seq("day"), "left_outer")
      .select(col("day"),
        coalesce(col("carry_in"), lit(0L)).as("carry_in"),
        (coalesce(col("carry_in"), lit(0L)) +
          greatest(lit(0L), col("max_after"))).as("peak"))
  }

  val peakConcurrencySql: String =
    s"""WITH iv AS (SELECT ts, ts + INTERVAL $TtlSeconds SECOND AS te
       |  FROM events WHERE ts IS NOT NULL),
       |b AS (SELECT day, t, CAST(SUM(net) AS BIGINT) AS net FROM (
       |    SELECT date_trunc('day', ts) AS day, ts AS t, 1 AS net FROM iv
       |    UNION ALL
       |    SELECT date_trunc('day', te), te, -1 FROM iv
       |    WHERE te <> date_trunc('day', te))
       |  GROUP BY 1, 2),
       |a AS (SELECT day, CAST(SUM(net) OVER (PARTITION BY day ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS after FROM b),
       |p AS (SELECT day, MAX(after) AS max_after FROM a GROUP BY 1),
       |c AS (SELECT date_trunc('day', te) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS carry_in FROM iv
       |  WHERE date_trunc('day', ts) <> date_trunc('day', te)
       |    AND te <> date_trunc('day', te) GROUP BY 1)
       |SELECT p.day, CAST(COALESCE(carry_in, 0) AS BIGINT) AS carry_in,
       |  CAST(COALESCE(carry_in, 0) + GREATEST(0, max_after) AS BIGINT)
       |    AS peak
       |FROM p LEFT JOIN c ON p.day = c.day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_peak_concurrency" -> (peakConcurrency _))

  val oracles: Map[String, String] = Map(
    "events_peak_concurrency" -> peakConcurrencySql)
}
