package graft

import org.apache.spark.sql.functions._

import graft.ext.Sweep

/** The day-partitioned sweep must equal a brute-force global sweep —
  * including across midnights, where the carry-in does the work. */
class SweepSpec extends SparkSpec {

  // ntz columns collect as LocalDateTime or Timestamp depending on the
  // plan's output type — normalize.
  private def ldt(v: Any): java.time.LocalDateTime = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime
    case d: java.time.LocalDateTime => d
    case other => fail(s"unexpected temporal type: ${other.getClass}")
  }

  test("gate result equals a brute-force global sweep, day by day") {
    // Brute force on the driver (fixture-sized): one GLOBAL ordered
    // sweep over net deltas per distinct instant, tracking for each day
    // both the concurrency it inherits at its first boundary (the
    // carry) and the running value after every boundary in it.
    val iv = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("ts")).collect()
      .map(r => ldt(r.get(0)))
      .map(t => (t, t.plusSeconds(Sweep.TtlSeconds)))
    val bounds = (iv.map(x => (x._1, (1, 0))) ++ iv.map(x => (x._2, (0, 1))))
      .groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toSeq
      .sortWith((a, b) => a._1.isBefore(b._1))
    var cur = 0L
    val peaks = scala.collection.mutable.Map[String, Long]()
    bounds.foreach { case (t, (nStarts, nEnds)) =>
      val day = t.toLocalDate.toString
      val atMidnight = t == t.toLocalDate.atStartOfDay
      // Value entering this boundary is a candidate for this day's peak
      // (at the day's first boundary it IS the carried-in concurrency) —
      // EXCEPT at an exact midnight, where the pre-value is the closing
      // day's concurrency, not this day's (half-open [ts, te): an
      // interval ending at the stroke of midnight was never alive today).
      if (!atMidnight)
        peaks.updateWith(day)(p => Some(p.getOrElse(0L).max(cur)))
      cur += nStarts - nEnds
      // A pure-end midnight instant contributes nothing to the new day
      // (and must not even create its row — the gate drops such rows).
      if (!atMidnight || nStarts > 0)
        peaks.updateWith(day)(p => Some(p.getOrElse(0L).max(cur)))
    }
    val got = Sweep.peakConcurrency(spark, sf).collect()
      .map(r => (ldt(r.get(0)).toLocalDate.toString, r.getLong(2))).toMap
    assert(got.nonEmpty && got.keySet == peaks.keySet)
    got.foreach { case (day, peak) =>
      assert(peak == peaks(day), s"day $day: gate $peak vs brute ${peaks(day)}")
    }
  }

  test("planted midnight-exact end never carries into the next day") {
    import spark.implicits._
    // Interval A ends at the stroke of midnight (alive only on day 1);
    // interval B genuinely crosses (alive at day-2 start); C is a
    // plain day-2 interval. Day 2's carry must count only B, and its
    // peak must be 2 (B + C overlapping), not 3.
    val iv = Seq(
      ("2024-03-01 23:55:00", "2024-03-02 00:00:00"), // A: boundary-exact
      ("2024-03-01 23:58:00", "2024-03-02 00:03:00"), // B: real carry
      ("2024-03-02 00:01:00", "2024-03-02 00:06:00")  // C
    ).toDF("ts_s", "te_s")
      .select(col("ts_s").cast("timestamp_ntz").as("ts"),
        col("te_s").cast("timestamp_ntz").as("te"))
    val got = Sweep.peakOf(iv).collect()
      .map(r => ldt(r.get(0)).toLocalDate.toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("2024-03-01") == (0L, 2L),
      s"day 1 expected carry 0 / peak 2 (A+B overlap), got ${got("2024-03-01")}")
    assert(got("2024-03-02") == (1L, 2L),
      s"day 2 expected carry 1 (B only) / peak 2 (B+C), got ${got("2024-03-02")}")
  }

  test("carry-in counts exactly the cross-midnight intervals") {
    val iv = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("ts"),
        (col("ts") + expr(s"INTERVAL ${Sweep.TtlSeconds} SECOND")).as("te"))
    val expected = iv
      .filter(to_date(col("ts")) =!= to_date(col("te"))
        && col("te") =!= date_trunc("day", col("te")))
      .groupBy(to_date(col("te")).as("d")).count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val got = Sweep.peakConcurrency(spark, sf)
      .filter(col("carry_in") > 0).collect()
      .map(r => (ldt(r.get(0)).toLocalDate.toString, r.getLong(1))).toMap
    assert(got == expected.filter(_._2 > 0))
  }
}
