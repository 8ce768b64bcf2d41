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
    val bounds = (iv.map(x => (x._1, +1)) ++ iv.map(x => (x._2, -1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortWith((a, b) => a._1.isBefore(b._1))
    var cur = 0L
    val peaks = scala.collection.mutable.Map[String, Long]()
    bounds.foreach { case (t, net) =>
      val day = t.toLocalDate.toString
      // value entering this boundary is a candidate for this day's peak
      // (at the day's first boundary it IS the carried-in concurrency)
      peaks.updateWith(day)(p => Some(p.getOrElse(0L).max(cur)))
      cur += net
      peaks.updateWith(day)(p => Some(p.getOrElse(0L).max(cur)))
    }
    val got = Sweep.peakConcurrency(spark, sf).collect()
      .map(r => (ldt(r.get(0)).toLocalDate.toString, r.getLong(2))).toMap
    assert(got.nonEmpty && got.keySet == peaks.keySet)
    got.foreach { case (day, peak) =>
      assert(peak == peaks(day), s"day $day: gate $peak vs brute ${peaks(day)}")
    }
  }

  test("carry-in counts exactly the cross-midnight intervals") {
    val iv = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("ts"),
        (col("ts") + expr(s"INTERVAL ${Sweep.TtlSeconds} SECOND")).as("te"))
    val expected = iv
      .filter(to_date(col("ts")) =!= to_date(col("te")))
      .groupBy(to_date(col("te")).as("d")).count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val got = Sweep.peakConcurrency(spark, sf)
      .filter(col("carry_in") > 0).collect()
      .map(r => (ldt(r.get(0)).toLocalDate.toString, r.getLong(1))).toMap
    assert(got == expected.filter(_._2 > 0))
  }
}
