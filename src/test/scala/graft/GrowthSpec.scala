package graft

import org.apache.spark.sql.functions._

import graft.ext.Growth

/** Rolling actives + cohort LTV: window nesting and reconciliation
  * invariants, partition invariance. */
class GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("rolling windows nest and the 6h window covers each hour's actives") {
    val rows = Growth.rollingActives(spark, sf)
      .select("rau_6h", "rau_24h", "rau_72h", "stickiness_pm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c, s) =>
      assert(a >= 1 && a <= b && b <= c, s"windows must nest: $a $b $c")
      assert(s == a * 1000 / c)
      assert(s >= 0 && s <= 1000)
    }
  }

  test("72h actives at the last hour equal distinct users of the last 72h") {
    val uh = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("uhour"))
      .distinct().localCheckpoint()
    val lastHour = uh.agg(max("uhour")).as[java.sql.Timestamp].head()
    val want = uh.filter(col("uhour") > lit(lastHour) -
      expr("INTERVAL 72 HOURS")).select("user_id").distinct().count()
    val got = Growth.rollingActives(spark, sf)
      .filter(col("hour") === lit(lastHour))
      .select("rau_72h").as[Long].head()
    assert(got == want)
  }

  test("cohort ltv triangle reconciles with order totals") {
    val tri = Growth.cohortLtv(spark, sf).localCheckpoint()
    val rows = tri.select("cohort_q", "age_q", "n_orders", "revenue")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "age cannot precede the cohort")
    // Age-0 cell exists for every cohort (the first order itself).
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.values.forall(_.exists(_._2 == 0L)))
    // Total orders and revenue across the triangle equal the table's.
    val nOrders = rows.map(_._3).sum
    assert(nOrders == Tables.orders(spark, sf).count())
    val rev = rows.map(_._4).sum
    val want = Tables.orders(spark, sf)
      .agg((sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("double") / 100.0)).as[Double].head()
    assert(math.abs(rev - want) < 1e-2)
  }

  test("growth frames are partition-invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a1 = Growth.rollingActives(spark, sf).localCheckpoint()
    val a2 = Growth.cohortLtv(spark, sf).localCheckpoint()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b1 = Growth.rollingActives(spark, sf)
      val b2 = Growth.cohortLtv(spark, sf)
      assert(a1.exceptAll(b1).count() == 0 && b1.exceptAll(a1).count() == 0)
      assert(a2.exceptAll(b2).count() == 0 && b2.exceptAll(a2).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
