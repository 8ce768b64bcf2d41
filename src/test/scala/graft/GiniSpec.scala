package graft

import org.apache.spark.sql.functions._

import graft.ext.Gini

/** Gini invariants: bounds, hand-computed cases, driver recompute. */
class GiniSpec extends SparkSpec {
  import spark.implicits._

  test("gate values match a driver-side recompute; bounds hold") {
    val out = Gini.revenueGini(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, g) =>
      assert(g >= 0L && g < 1000000L, s"gini out of [0,1e6): $g (n=$n)")
    }
    val rev = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("rev")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rev.foreach { case (seg, rows) =>
      val xs = rows.sortBy(t => (t._3, t._2)).map(_._3.longValue)
      val n = xs.length.toLong
      val s = xs.sum
      val w = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val g = (BigInt(1000000) * (BigInt(2) * w - BigInt(n + 1) * s) /
        (BigInt(n) * BigInt(s))).toLong
      assert(out(seg) == ((n, g)), s"$seg: ${out(seg)} vs ($n, $g)")
    }
  }

  test("hand cases: perfect equality is 0; concentration approaches 1") {
    def giniOf(revs: Seq[Long]): Long = {
      val xs = revs.sorted
      val n = xs.length.toLong
      val s = xs.sum
      val w = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (BigInt(1000000) * (BigInt(2) * w - BigInt(n + 1) * s) /
        (BigInt(n) * BigInt(s))).toLong
    }
    assert(giniOf(Seq(5L, 5L, 5L, 5L)) == 0L)
    // One whale among 10: G = (n-1)/n - epsilon region, here 9/10 scaled.
    assert(giniOf(Seq.fill(9)(0L) :+ 100L) == 900000L)
  }
}
