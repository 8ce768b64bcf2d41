package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.Retention

/** Pins the cohort algebra: first-seen week buckets, within-week
  * dedup, exact week offsets, and matrix/corpus reconciliation. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 is a Monday: week k starts at day 7k.
  private def ts(day: Int, h: Int = 12) =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")

  private val events = Seq(
    (1L, ts(0)), (1L, ts(8)), (1L, ts(22)),            // w0, w1, w3 → 0,1,3
    (2L, ts(7)), (2L, ts(9, 23)), (2L, ts(14)),        // w1 twice (dedups), w2
    (3L, ts(21))).toDF("user_id", "ts")                // w3 only

  test("matrix: cohorts anchor at first week, offsets exact, weeks dedup") {
    val got = Retention.retentionOf(events).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L,
      ("2024-01-22", 0L) -> 1L))
  }

  test("gated corpus matrix reconciles: offset-0 row sums to all users") {
    val m = Retention.retention(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(m.filter(_._1 == 0L).map(_._2).sum == users,
      "every user appears in their own cohort's week 0")
    assert(m.exists(_._1 > 0L), "no returning users — vacuous matrix")
  }
}
