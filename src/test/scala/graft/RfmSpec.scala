package graft

import org.apache.spark.sql.functions._

import graft.ext.Rfm

/** RFM segmentation + ABC curve: score-range/coverage invariants, the
  * Pareto knee ordering, and partition-invariance of both frames. */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  test("rfm scores are 1..4, cells match scores, labels cover the grid") {
    val rows = Rfm.rfmSegments(spark, sf)
      .select("r_score", "f_score", "m_score", "rfm_cell", "rfm_label")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, f, m, cell, label) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(cell == r * 100 + f * 10 + m)
      assert(Set("champions", "loyal", "new", "at_risk", "hibernating",
        "regular").contains(label))
    }
  }

  test("rfm quartiles are balanced within each segment") {
    // ntile(4) buckets differ by at most one row per segment.
    val sizes = Rfm.rfmSegments(spark, sf)
      .groupBy("c_mktsegment", "m_score").count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"))
      .select("spread").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ <= 1))
  }

  test("abc classes are contiguous down the revenue curve and cover A<B<C") {
    val rows = Rfm.abcPareto(spark, sf)
      .select("p_brand", "cum_pm", "abc_class")
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    // Within a brand, sorted by cum_pm, classes must be a run of A's,
    // then B's, then C's (the knee compares are monotone in cum).
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val cls = rs.sortBy(_._2).map(_._3).mkString
      assert("^A*B*C*$".r.matches(cls), s"brand $brand order: $cls")
    }
    // The head class exists and the per-brand curve ends at 1000 permille.
    val byBrand = rows.groupBy(_._1)
    byBrand.foreach { case (brand, rs) =>
      assert(rs.map(_._2).max == 1000L, s"brand $brand curve incomplete")
    }
  }

  test("abc revenue reconciles with the q1-style lineitem total") {
    val fromAbc = Rfm.abcPareto(spark, sf)
      .agg(sum(col("revenue"))).as[Double].head()
    val direct = Tables.lineitem(spark, sf)
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("double") / 1e6)).as[Double].head()
    assert(math.abs(fromAbc - direct) < 1e-3,
      s"abc=$fromAbc direct=$direct") // only float emission rounding apart
  }

  test("both frames are partition-invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a1 = Rfm.rfmSegments(spark, sf).localCheckpoint()
    val a2 = Rfm.abcPareto(spark, sf).localCheckpoint()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b1 = Rfm.rfmSegments(spark, sf)
      val b2 = Rfm.abcPareto(spark, sf)
      assert(a1.exceptAll(b1).count() == 0 && b1.exceptAll(a1).count() == 0)
      assert(a2.exceptAll(b2).count() == 0 && b2.exceptAll(a2).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
