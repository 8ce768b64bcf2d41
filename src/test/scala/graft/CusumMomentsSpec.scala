package graft

import org.apache.spark.sql.functions._

import graft.ext.{Events, Moments}

/** CUSUM closed form vs the textbook recursion, planted level shift,
  * and the moment numerators vs a local exact reference. */
class CusumMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("cusum closed form equals the max(0, S+d) recursion per type") {
    val series = Events.gapfillHourly(spark, sf)
      .orderBy("event_type", "hour")
      .select("event_type", "cnt").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val got = Events.cusumHourly(spark, sf)
      .orderBy("event_type", "hour")
      .select("event_type", "s_pos", "s_neg")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toVector).toMap
    assert(got.keySet == series.keySet && got.nonEmpty)
    series.foreach { case (t, xs) =>
      val n = xs.size.toLong
      val sx = xs.sum
      val ds = xs.map(x => n * x - sx)
      val sPos = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val sNeg = ds.scanLeft(0L)((s, d) => math.max(0L, s - d)).tail
      assert(got(t) == sPos.zip(sNeg), s"type $t cusum mismatch")
    }
  }

  test("a planted level shift alarms after the step, not before") {
    // 60 flat hours at 10, then 60 at 25: the upward arm must cross 3σ
    // somewhere after the step and never before it.
    val xs = Vector.fill(60)(10L) ++ Vector.fill(60)(25L)
    val n = xs.size.toLong
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val vy = n * sxx - sx * sx
    val ds = xs.map(x => n * x - sx)
    val sPos = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val alarms = sPos.map(s => BigInt(s) * BigInt(s) > BigInt(9) * BigInt(vy))
    assert(!alarms.take(60).exists(identity), "false alarm before the step")
    assert(alarms.drop(60).exists(identity), "missed the planted shift")
  }

  test("moment numerators match a local exact reference per cell") {
    val cells = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("q"))
      .as[(String, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3)).toMap
    val got = Moments.shapeStats(spark, sf)
      .select("l_returnflag", "l_linestatus", "m2n", "m3n", "m4n")
      .as[(String, String, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got.keySet == cells.keySet && got.nonEmpty)
    cells.foreach { case (k, qs) =>
      val n = BigInt(qs.size)
      val s1 = qs.map(BigInt(_)).sum
      val s2 = qs.map(q => BigInt(q) * q).sum
      val s3 = qs.map(q => BigInt(q) * q * q).sum
      val s4 = qs.map(q => BigInt(q) * q * q * q).sum
      val m2n = n * s2 - s1 * s1
      val m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val m4n = n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      assert(got(k) == (m2n.toDouble, m3n.toDouble, m4n.toDouble),
        s"cell $k numerator mismatch")
    }
  }

  test("skewness/kurtosis are zero/negative-ish on a symmetric uniform") {
    // Exact check of the closed forms on 1..9 uniform: m3 = 0 exactly,
    // kurtosis of a discrete uniform < 0 (platykurtic).
    val qs = (1L to 9L)
    val n = BigInt(qs.size)
    val s1 = qs.map(BigInt(_)).sum
    val s2 = qs.map(q => BigInt(q) * q).sum
    val s3 = qs.map(q => BigInt(q) * q * q).sum
    val s4 = qs.map(q => BigInt(q) * q * q * q).sum
    val m2n = n * s2 - s1 * s1
    val m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    val m4n = n * n * n * s4 - 4 * n * n * s1 * s3 +
      6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    assert(m3n == 0)
    assert(m4n.toDouble / (m2n.toDouble * m2n.toDouble) - 3.0 < 0)
  }

  test("changepoint summary picks each arm's true peak") {
    val c = Events.cusumHourly(spark, sf)
      .select("event_type", "hour", "s_pos", "s_neg")
      .as[(String, java.sql.Timestamp, Long, Long)].collect()
    val got = Events.cusumChangepoints(spark, sf)
      .select("event_type", "arm", "peak_hour", "peak_s")
      .as[(String, String, java.sql.Timestamp, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.nonEmpty)
    c.groupBy(_._1).foreach { case (t, rows) =>
      val up = rows.map(r => (r._3, r._2)).max // (value, -) then earliest?
      val upBest = rows.filter(_._3 == rows.map(_._3).max)
        .minBy(_._2.getTime)
      assert(got((t, "up")) == ((upBest._2, upBest._3)), s"type $t up peak")
      val dnBest = rows.filter(_._4 == rows.map(_._4).max)
        .minBy(_._2.getTime)
      assert(got((t, "down")) == ((dnBest._2, dnBest._4)), s"type $t down")
      assert(up._1 >= 0)
    }
  }

  test("dow-hour heatmap covers every event exactly once") {
    val rows = Events.dowHourHeatmap(spark, sf)
      .select("dow", "hod", "n", "share_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == Tables.events(spark, sf).count())
    rows.foreach { case (d, h, _, s) =>
      assert(d >= 1 && d <= 7 && h >= 0 && h <= 23 && s >= 0 && s <= 1000)
    }
  }

  test("cusum frame is partition-invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Events.cusumHourly(spark, sf).localCheckpoint()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Events.cusumHourly(spark, sf)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
