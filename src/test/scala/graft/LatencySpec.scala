package graft

import org.apache.spark.sql.functions._

import graft.ext.Latency

/** Latency distributions: reconciliation and lead-time semantics. */
class LatencySpec extends SparkSpec {
  import spark.implicits._

  test("ship latency distribution covers every lineitem exactly once") {
    val rows = Latency.shipLatency(spark, sf)
      .select("n_lines", "share_pm").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sum == Tables.lineitem(spark, sf).count())
    assert(rows.forall { case (_, s) => s >= 0 && s <= 1000 })
  }

  test("lead time: every bucket is inside the funnel window") {
    val rows = Latency.conversionLeadTime(spark, sf)
      .select("bucket_10min", "n_users", "sum_lead_us")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val maxBucket = graft.ext.Funnel.WindowMin * 60000000L / Latency.BucketUs
    rows.foreach { case (b, n, s) =>
      assert(b >= 0 && b <= maxBucket, s"bucket $b outside window")
      assert(n > 0)
      // bucket bounds contain the mean lead of the bucket
      assert(s >= b * Latency.BucketUs * n && s < (b + 1) * Latency.BucketUs * n)
    }
    // One row per converting user overall.
    val users = rows.map(_._2).sum
    assert(users > 0 && users <= Tables.events(spark, sf)
      .select("user_id").distinct().count())
  }

  test("lead time matches a local reference on the fixture") {
    val w = graft.ext.Funnel.WMicros
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .as[(Long, String, Long, Long)].collect()
    val want = events.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._3))
      var lastView = Long.MinValue
      var hit: Option[Long] = None
      sorted.foreach { e =>
        if (hit.isEmpty) {
          if (e._2 == "purchase" && lastView != Long.MinValue &&
            e._4 - lastView <= w && e._4 > lastView)
            hit = Some(e._4 - lastView)
          if (e._2 == "view") lastView = math.max(lastView, e._4)
        }
      }
      hit
    }.toSeq.groupBy(_ / Latency.BucketUs).view
      .mapValues(v => (v.size.toLong, v.sum)).toMap
    val got = Latency.conversionLeadTime(spark, sf)
      .select("bucket_10min", "n_users", "sum_lead_us")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
  }
}
