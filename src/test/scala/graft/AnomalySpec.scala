package graft

import org.apache.spark.sql.functions._

import graft.ext.Events

/** Pins the z-score algebra against a from-scratch recomputation: the
  * gate's exactness story is integer moments + one terminal double
  * chain, so an independent fold over the same 24 counts must land on
  * the IDENTICAL double. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("z matches an independent recomputation from the raw series") {
    val series = Events.gapfillHourly(spark, sf)
      .collect().map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toVector).toMap
    val got = Events.hourlyAnomaly(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))
      .toMap
    assert(got.nonEmpty)
    val hours = Events.gapfillHourly(spark, sf)
      .select(col("hour")).distinct().orderBy(col("hour"))
      .collect().map(_.getTimestamp(0))
    var checked = 0
    for ((tpe, counts) <- series; i <- 24 until counts.length) {
      val frame = counts.slice(i - 24, i)
      val s1 = frame.sum
      val s2 = frame.map(c => c * c).sum
      val num = 24L * s2 - s1 * s1
      val expectZ =
        if (num == 0L) None
        else Some((counts(i).toDouble - s1.toDouble / 24.0) /
          math.sqrt(num.toDouble / 576.0))
      val (cnt, z, flag) = got((tpe, hours(i)))
      assert(cnt == counts(i), s"$tpe ${hours(i)}")
      assert(z == expectZ, s"$tpe ${hours(i)}: got $z expected $expectZ")
      assert(flag == z.exists(v => math.abs(v) > 3.0))
      checked += 1
    }
    assert(checked == got.size, "every scored row re-derived")
  }

  test("ewma matches an independent weighted fold over the raw series") {
    val series = Events.gapfillHourly(spark, sf)
      .collect().map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toVector).toMap
    val hours = Events.gapfillHourly(spark, sf)
      .select(col("hour")).distinct().orderBy(col("hour"))
      .collect().map(_.getTimestamp(0))
    val got = Events.ewmaHourly(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    var checked = 0
    for ((tpe, counts) <- series; i <- (Events.EwmaLags - 1) until counts.length) {
      // num = Σ_{lag<16} cnt(t−lag) · 2^(15−lag), exactly.
      val num = (0 until Events.EwmaLags)
        .map(lag => counts(i - lag) * (1L << (Events.EwmaLags - 1 - lag))).sum
      val (cnt, gotNum, gotEwma) = got((tpe, hours(i)))
      assert(cnt == counts(i) && gotNum == num, s"$tpe ${hours(i)}")
      assert(gotEwma == num.toDouble / ((1L << Events.EwmaLags) - 1).toDouble)
      // The smoother is a convex combination: bounded by the frame.
      val frame = counts.slice(i - Events.EwmaLags + 1, i + 1)
      assert(gotEwma >= frame.min.toDouble && gotEwma <= frame.max.toDouble)
      checked += 1
    }
    assert(checked == got.size, "every smoothed row re-derived")
  }

  test("autocorrelation matches an independent pairwise recomputation") {
    val series = Events.gapfillHourly(spark, sf)
      .collect().map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toVector).toMap
    val got = Events.autocorrHourly(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7),
          if (r.isNullAt(11)) None else Some(r.getDouble(11))))
      .toMap
    assert(got.size == series.size * Events.AcfLags.size)
    for ((tpe, counts) <- series; k <- Events.AcfLags) {
      // Pairs (x_t, x_{t−k}) for t ≥ k, folded with exact Long moments.
      val pairs = (k until counts.length).map(t => (counts(t), counts(t - k)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      val expectR =
        if (vx == 0L || vy == 0L) None
        else Some((n * sxy - sx * sy).toDouble /
          math.sqrt(vx.toDouble * vy.toDouble))
      val (gn, gsx, gsy, gsxy, gsxx, gsyy, gr) = got((tpe, k.toLong))
      assert((gn, gsx, gsy, gsxy, gsxx, gsyy) == ((n, sx, sy, sxy, sxx, syy)),
        s"$tpe lag $k moments")
      assert(gr == expectR, s"$tpe lag $k: got $gr expected $expectR")
      // Cauchy–Schwarz: a correlation is always in [−1, 1].
      gr.foreach(r => assert(r >= -1.0 && r <= 1.0))
    }
  }

  test("markov transitions match a driver fold over each user's stream") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts".cast("timestamp")),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(e => (e._2, e._3)).map(_._4).sliding(2)
        .filter(_.length == 2).map(p => (p(0), p(1)))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = want.groupBy(_._1._1)
      .map { case (p, m) => p -> m.values.sum }
    val got = Events.markovTransitions(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (p, n, cnt, tot, pm) =>
      assert(cnt == want((p, n)), s"$p->$n")
      assert(tot == totals(p) && pm == cnt * 1000 / tot)
    }
    assert(got.map(r => (r._1, r._2)).toSet == want.keySet)
    // Rows per prev sum to the prev total (a proper conditional dist).
    got.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._3).sum == rows.head._4, s"total($p)")
    }
  }

  test("MAD flags match an independent doubled-median fold") {
    val series = Events.gapfillHourly(spark, sf)
      .collect().map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1) // 1-indexed center pair
    }
    val want = series.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val m2 = med2(rows.map(_._3).toSeq)
      val devs = rows.toSeq.map(r => (r._2, r._3, math.abs(2 * r._3 - m2)))
      val m4 = med2(devs.map(_._3))
      devs.map { case (h, c, d) =>
        (tpe, h) -> ((c, m2, d, m4, 2 * d > 3 * m4)) }
    }.toMap
    val got = Events.madHourly(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(got == want)
    // Robustness is the point: flags exist, and they are a minority
    // (a robust detector must not flag half the series).
    val flagged = got.values.count(_._5)
    assert(flagged > 0, "no outliers flagged — threshold vacuous")
    assert(flagged * 4 < got.size, s"$flagged/${got.size} flagged")
  }

  test("out-of-order audit: per-user regressions match a sequential fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = ext.Events.outOfOrder(spark, sf)
      .select(unix_micros(col("hour").cast("timestamp")).as("h"),
        col("n_events"), col("n_ooo"), col("max_late_us"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // Sequential per-user fold over arrival (event_id) order, with the
    // same planted-lateness slice applied by hand.
    val P = ext.Hashing.P
    val ev = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, uid, tsu0) =>
        val ih = ((id % P) * 40503 + 12345) % P
        val tsu = tsu0 -
          (if (ih % ext.Events.OooSliceMod == 0) ext.Events.OooDelayUs
           else 0L)
        (id, uid, tsu, tsu / 3600000000L * 3600000000L)
      }
    val want = collection.mutable.Map
      .empty[Long, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    ev.groupBy(_._2).foreach { case (_, es) =>
      var mx = Long.MinValue
      es.sortBy(_._1).foreach { case (_, _, tsu, hour) =>
        val late = if (mx > tsu) mx - tsu else 0L
        val (n, o, ml) = want(hour)
        want(hour) = (n + 1, o + (if (late > 0) 1L else 0L),
          math.max(ml, late))
        mx = math.max(mx, tsu)
      }
    }
    assert(got == want.toMap, {
      val d = got.keySet ++ want.keySet
      d.filter(k => got.get(k) != want.toMap.get(k)).take(3)
        .map(k => s"$k: got=${got.get(k)} want=${want.get(k)}").mkString(";")
    })
    assert(got.values.exists(_._2 > 0),
      "fixture must contain genuine out-of-order arrivals")
  }
}
