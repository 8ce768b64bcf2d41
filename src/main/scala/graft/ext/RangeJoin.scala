package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval/range join — the other join class Spark has no native node
  * for (beyond-reference, like AsOf). The scalable shape is BIN
  * BUCKETING, not an inequality join: bin both sides' timestamps by the
  * window width W, probe bins {bin, bin+1} on the left, equi-join on
  * (key, bin), then apply the exact interval predicate. Each candidate
  * pair is produced exactly once (the right row has one bin; the two
  * probe bins are distinct), so there is no dedup stage. Candidate count
  * is O(pairs within ~2W), never the O(n²) an inequality join risks —
  * the equi-join shuffles on (key, bin) like any join at 100 TB.
  */
object RangeJoin {

  /** Start of the W-aligned bin containing `t`. pmod is a true
    * mathematical mod, so this FLOOR-aligns for negative times too
    * (`div` truncates toward zero, which would disagree across the two
    * sides at bin boundaries before 1970 and silently drop pairs). Pure
    * integer arithmetic — no division, no float rounding. */
  private def binStart(t: Column, w: Long): Column = t - pmod(t, lit(w))

  /** Generic interval join: pairs (l, r) with matching keys and
    * r.time ∈ [l.time, l.time + windowMicros]. Both time columns must be
    * epoch-micros Longs; output carries all left columns + all right
    * columns (caller renames collisions beforehand). Bin labels are
    * window-start offsets built with Column arithmetic (not SQL-string
    * interpolation, which broke on non-identifier column names). */
  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "intervalJoin reserves the internal column name __bin")
    val l = left.withColumn("__bin", explode(array(
      binStart(col(leftTime), windowMicros),
      binStart(col(leftTime), windowMicros) + windowMicros)))
    val r = right.withColumn("__bin", binStart(col(rightTime), windowMicros))
    l.join(r, l("__bin") === r("__bin") && l(leftKey) === r(rightKey))
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + windowMicros)
      .drop("__bin")
  }

  private val WindowMicros = 600000000L // 10 minutes

  /** Same-user event pairs where the later-id event follows within 10
    * minutes: (a, b) with a.id < b.id and b.ts ∈ [a.ts, a.ts + W]. */
  def eventPairsWithin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("tus"))
    val a = e.select(col("event_id").as("event_id_a"),
      col("user_id").as("user_a"), col("tus").as("a_t"))
    val b = e.select(col("event_id").as("event_id_b"),
      col("user_id").as("user_b"), col("tus").as("b_t"))
    intervalJoin(a, b, "user_a", "user_b", "a_t", "b_t", WindowMicros)
      .filter(col("event_id_a") < col("event_id_b"))
      .select(col("event_id_a"), col("event_id_b"),
        col("user_a").as("user_id"), (col("b_t") - col("a_t")).as("gap_us"))
  }

  val eventPairsWithinSql: String =
    s"""SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
       |  a.user_id, epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
       |FROM events a JOIN events b
       |ON a.user_id = b.user_id AND a.event_id < b.event_id
       |  AND epoch_us(b.ts) >= epoch_us(a.ts)
       |  AND epoch_us(b.ts) <= epoch_us(a.ts) + $WindowMicros""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_range_pairs" -> (eventPairsWithin _))

  val oracles: Map[String, String] = Map(
    "events_range_pairs" -> eventPairsWithinSql)
}
