package graft

import org.apache.spark.sql.functions._

import graft.ext.{Events, Paths}

/** Path trigrams and repurchase rates: marginalization against the
  * Markov transition matrix and count conservation. */
class PathsSpec extends SparkSpec {
  import spark.implicits._

  test("trigram counts marginalize to the first-order transition counts") {
    // Sum of path counts over s3 with (s1,s2) fixed = transitions
    // (s1->s2) that have at least one following event — i.e., the
    // bigram count restricted to non-terminal positions. Verify the
    // weaker exact invariant: trigram marginal <= bigram count, with
    // equality whenever the (s1,s2) pair never ends a user stream.
    val tri = Paths.topPaths(spark, sf)
      .groupBy("s1", "s2").agg(sum("n").as("tri_n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val bi = Events.markovTransitions(spark, sf)
      .select("prev_type", "next_type", "n")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(tri.nonEmpty)
    tri.foreach { case (k, n) =>
      assert(bi.contains(k) && n <= bi(k), s"pair $k: tri $n > bi ${bi(k)}")
    }
    // Global conservation: total trigrams = total events - 2 per user
    // with >= 3 events (exactly: sum over users of max(0, n_u - 2)).
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .select("count").as[Long].collect()
    val want = perUser.map(n => math.max(0L, n - 2)).sum
    assert(tri.values.sum == want)
  }

  test("shares are consistent and bounded") {
    val rows = Paths.topPaths(spark, sf)
      .select("n", "share_pm", "cond_share_pm")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, s, c) =>
      n > 0 && s >= 0 && s <= 1000 && c >= 0 && c <= 1000
    })
  }

  test("markov stationary replays the scaled-integer iteration locally") {
    val trans = Events.markovTransitions(spark, sf)
      .select("prev_type", "next_type", "n")
      .as[(String, String, Long)].collect()
    val types = trans.map(_._1).distinct.sorted
    val S = 1000000L
    var pi = types.map(_ -> S).toMap
    for (_ <- 1 to Events.StationaryIters) {
      val raw = trans.groupBy(_._2).view.mapValues(ts =>
        ts.map { case (p, _, n) => pi.getOrElse(p, 0L) * n }.sum).toMap
      val tot = raw.values.sum
      pi = raw.view.mapValues(v => v * S / tot).toMap
    }
    val got = Events.markovStationary(spark, sf)
      .select("event_type", "pi_scaled").as[(String, Long)].collect().toMap
    assert(got == pi)
    // Total stationary mass within truncation slack of the scale.
    val mass = got.values.sum
    assert(mass <= S && mass >= S - got.size)
  }

  test("benford screening: exponential sample near the law, uniform far") {
    val pm = graft.ext.Audit.BenfordPm
    assert(pm.sum <= 1000 && pm.sum >= 990) // the law's mass, floored
    def digits(xs: Seq[Long]): Map[Int, Long] =
      xs.map(_.toString.head.asDigit).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
    // Deterministic geometric growth spans many decades -> Benford.
    val exp = (1 to 4000).map(i => math.round(math.pow(1.003, i) * 100))
    val eD = digits(exp); val eN = exp.size
    val eDev = (1 to 9).map(d =>
      math.abs(eD.getOrElse(d, 0L) * 1000 / eN - pm(d - 1))).max
    assert(eDev <= 30, s"exponential sample deviates $eDev pm from Benford")
    // Uniform sample concentrates mass per decade -> far from the law.
    val uni = (100000L to 104000L)
    val uD = digits(uni)
    val uDev = (1 to 9).map(d =>
      math.abs(uD.getOrElse(d, 0L) * 1000 / uni.size - pm(d - 1))).max
    assert(uDev >= 200, s"uniform sample unexpectedly Benford ($uDev)")
    // The gated frame reconciles: counts cover all orders, deviations
    // are observed minus expected.
    val rows = graft.ext.Audit.benfordOrders(spark, sf)
      .select("digit", "n", "observed_pm", "benford_pm", "deviation_pm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == Tables.orders(spark, sf).count())
    rows.foreach { case (d, _, o, b, dev) =>
      assert(d >= 1 && d <= 9 && dev == o - b && b == pm(d.toInt - 1))
    }
  }

  test("repurchase rate reconciles against distinct customer counts") {
    val rows = Paths.repurchaseRate(spark, sf)
      .select("l_partkey", "n_customers", "n_repeat_customers", "repeat_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, r, pm) =>
      assert(r <= n && pm == r * 1000 / n)
    }
    // Spot-check one part against a direct computation.
    val pk = rows.maxBy(_._3)._1
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === pk)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(countDistinct("o_orderdate").as("d"))
      .agg(count(lit(1)), sum(when(col("d") >= 2, 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    val got = rows.find(_._1 == pk).get
    assert((got._2, got._3) == want)
  }
}
