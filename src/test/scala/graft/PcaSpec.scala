package graft

import org.apache.spark.sql.functions._

import graft.ext.Pca

/** Exact-integer power iteration: the truncation-parity assumption,
  * recovery of a planted dominant axis, and partition invariance. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("Spark div truncates toward zero like DuckDB // (load-bearing)") {
    // The whole trajectory's cross-engine determinism rides on this:
    // DuckDB -7 // 2 = -3 (verified), so Spark must give -3, not
    // floor's -4, wherever a negative scatter entry meets a divisor.
    val r = spark.sql(
      "SELECT -7 div 2 AS a, 7 div 2 AS b, -7L div 3L AS c").head()
    assert(r.getLong(0) == -3L && r.getLong(1) == 3L && r.getLong(2) == -2L)
  }

  test("planted dominant axis is recovered with the right sign structure") {
    // Cloud: dim 3 carries variance ~100x every other dim; the top
    // component must load dim 3 at the max magnitude (Scale) and
    // everything else near zero.
    val d = 8
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 40) & 0xff }
    val vecs = (0 until 200).map { _ =>
      Array.tabulate(d)(j =>
        if (j == 3) (next() - 128) * 100 else next() - 128)
        .map(_.toLong).toSeq
    }
    val q = vecs.toDF("qv")
    val out = Pca.topComponentOf(q)
      .select("dim", "loading", "rayleigh")
      .as[(Long, Long, Double)].collect()
    assert(out.length == d)
    val byDim = out.map(r => r._1 -> r._2).toMap
    val top = byDim.maxBy { case (_, l) => math.abs(l) }
    assert(top._1 == 3L, s"dominant axis not recovered: $byDim")
    assert(math.abs(top._2) == Pca.Scale ||
      math.abs(top._2) == byDim.values.map(math.abs).max)
    // Off-axis loadings are an order of magnitude smaller.
    byDim.filter(_._1 != 3L).values.foreach(l =>
      assert(math.abs(l) < Pca.Scale / 5, s"off-axis loading $l too big"))
    // Rayleigh estimate is positive (a scatter matrix is PSD).
    assert(out.head._3 > 0.0)
  }

  test("gated frame is partition-invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = graft.ext.Pca.topComponent(spark, sf).localCheckpoint()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = graft.ext.Pca.topComponent(spark, sf)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
