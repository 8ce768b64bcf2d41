package graft

import org.apache.spark.sql.functions._

import graft.ext.{Forecast, Skyline}
import graft.ext.KnnEval

/** Skyline, seasonal-naive, and dim-truncation invariants. */
class SkylineSpec extends SparkSpec {

  test("skyline: no member is dominated (quadratic recheck)") {
    val sky = Skyline.ordersSkyline(spark, sf)
      .select(col("segment"), col("o_orderdate").cast("string").as("date"),
        round(col("price") * 100).cast("long").as("pc")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // Brute force per segment on the driver: nothing earlier-or-equal
    // dated may be strictly richer; nothing strictly earlier may be
    // richer-or-equal.
    val all = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderdate").cast("string"),
        round(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    sky.foreach { case (seg, date, pc) =>
      val dominators = all(seg).filter { case (_, d2, p2) =>
        (d2 <= date && p2 > pc) || (d2 < date && p2 >= pc)
      }
      assert(dominators.isEmpty, s"$seg $date $pc dominated by ${dominators.take(1)}")
    }
    assert(sky.nonEmpty)
  }

  test("skyline: every non-member IS dominated") {
    val skySet = Skyline.ordersSkyline(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val all = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        col("o_orderdate").cast("string"),
        round(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bySeg = all.groupBy(_._2)
    all.filterNot(t => skySet.contains(t._1)).take(200).foreach {
      case (k, seg, date, pc) =>
        val dominated = bySeg(seg).exists { case (_, _, d2, p2) =>
          (d2 <= date && p2 > pc) || (d2 < date && p2 >= pc)
        }
        assert(dominated, s"non-member $k is undominated — missing from skyline")
    }
  }

  private def ldt(v: Any): java.time.LocalDateTime = v match {
    case t: java.sql.Timestamp => t.toLocalDateTime
    case d: java.time.LocalDateTime => d
    case other => fail(s"unexpected temporal type: ${other.getClass}")
  }

  test("seasonal naive: errors match a driver recompute; first week absent") {
    val out = Forecast.seasonalNaive(spark, sf).collect()
      .map(r => (ldt(r.get(0)).toLocalDate, r.getLong(3))).toMap
    val hourly = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("h")).count()
      .collect().map(r => (ldt(r.get(0)), r.getLong(1))).toMap
    val recomputed =
      scala.collection.mutable.Map[java.time.LocalDate, Long]()
    hourly.foreach { case (h, cnt) =>
      hourly.get(h.minusHours(168L)).foreach { pred =>
        recomputed.updateWith(h.toLocalDate)(v =>
          Some(v.getOrElse(0L) + math.abs(cnt - pred)))
      }
    }
    assert(out.nonEmpty)
    out.foreach { case (day, sae) =>
      assert(recomputed.get(day).contains(sae),
        s"$day: $sae vs ${recomputed.get(day)}")
    }
    // Hours in the first week have no t-168 predecessor: the earliest
    // event day must be absent from the report.
    assert(!out.contains(hourly.keys.min(Ordering.by[java.time.LocalDateTime,
      String](_.toString)).toLocalDate))
  }

  test("dim truncation: full-dim arm is exact; recall non-trivial") {
    val rows = KnnEval.knnDimTruncation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows.keySet == KnnEval.TruncDims.map(_.toLong).toSet)
    assert(rows(64L) == 1000L, s"self-recall must be 1000, got ${rows(64L)}")
    // Monotone-ish sanity: a longer prefix can't be catastrophically
    // worse than a shorter one on this fixture (allow small inversions).
    assert(rows(32L) >= rows(8L) - 100)
  }
}
