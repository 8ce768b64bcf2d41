package graft

import org.apache.spark.sql.functions._

import graft.ext.Growth

/** Tier-selection seam for rolling actives (r10 ask #5): the auto gate
  * must pick the exact tier below the fan-row bound and the HLL tier
  * above it, with ONE stable output schema either way, so the DuckDB
  * oracle can replay the identical |events|-count decision. */
class AutoTierSpec extends SparkSpec {

  test("decision boundary: exact below the fan-row cap, hll above") {
    val cap = Growth.AutoFanRowCap
    val w = Growth.Windows.max
    assert(!Growth.useHllTier(0L))
    assert(!Growth.useHllTier(cap / w)) // n*w == cap: still exact
    assert(Growth.useHllTier(cap / w + 1)) // first count over the cap
    assert(Growth.useHllTier(100000000L)) // far past any fixture
    // The measured knee the cap encodes post-coverage-rewrite: sf1
    // (~1M events, 72M worst-case coverage rows) stays EXACT (3.0 s
    // measured, exactness is free), sf3 (~3M events, 216M bound) flips
    // to HLL — past there exact state grows with corpus × density
    // while HLL stays spine-shaped.
    assert(!Growth.useHllTier(100000L)) // sf0.1
    assert(!Growth.useHllTier(1000000L)) // sf1
    assert(Growth.useHllTier(3000000L)) // sf3
  }

  test("auto output at fixture scale IS the exact tier, renamed + tagged") {
    val auto = Growth.rollingActivesAuto(spark, sf).localCheckpoint()
    assert(auto.columns.toSeq ==
      "hour" +: Growth.Windows.map(w => s"rau_${w}h") :+ "tier")
    assert(auto.select("tier").distinct().collect().map(_.getString(0))
      .toSeq == Seq("exact"))
    val exact = Growth.rollingActives(spark, sf).select(
      col("hour") +: Growth.Windows.map(w => col(s"rau_${w}h")) :+
        lit("exact").as("tier"): _*)
    assert(auto.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(auto).count() == 0)
  }

  test("both branches project to the same schema") {
    // The HLL branch's rename must land on the exact branch's column
    // set — a drifting schema would silently break the oracle compare
    // whenever the tier flips at a larger SF.
    val hllRenamed = Growth.rollingActivesHll(spark, sf).select(
      col("hour") +: Growth.Windows.map(w =>
        col(s"rau_${w}h_est").as(s"rau_${w}h")) :+
        lit("hll").as("tier"): _*)
    val auto = Growth.rollingActivesAuto(spark, sf)
    assert(hllRenamed.columns.toSeq == auto.columns.toSeq)
    assert(hllRenamed.schema.map(_.dataType) == auto.schema.map(_.dataType))
  }
}
