package graft

import org.apache.spark.sql.functions._

import graft.ext.ScalarQuant

/** Int8 scalar quantization: extremes map to 0/255, residual bound,
  * degenerate-range safety, and partition-invariance. */
class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  test("extremes code to 0 and 255; constant dim codes to 0 with no error") {
    // dim 0 spans [-100, 100]; dim 1 is constant (hi = lo — the
    // degenerate-range branch must not divide by zero).
    val q = Seq(
      (1L, Seq(-100L, 7L)),
      (2L, Seq(0L, 7L)),
      (3L, Seq(100L, 7L))
    ).toDF("vec_id", "qv")
    val c = ScalarQuant.codedOf(q)
      .select("vec_id", "dim", "code", "err255")
      .as[(Long, Int, Long, Long)].collect()
      .map { case (v, d, code, e) => ((v, d), (code, e)) }.toMap
    assert(c((1L, 0)) == (0L, 0L), "corpus min codes to 0 exactly")
    assert(c((3L, 0)) == (255L, 0L), "corpus max codes to 255 exactly")
    // Midpoint: (0 - (-100)) * 255 div 200 = 127, err = 100*255 - 127*200
    assert(c((2L, 0)) == (127L, 100L))
    assert(c((1L, 1)) == (0L, 0L) && c((2L, 1)) == (0L, 0L))
  }

  test("residuals bounded by dim range; report shape (fixture)") {
    val rep = ScalarQuant.sqReport(spark, sf)
    assert(rep.count() == 64)
    val bad = rep.filter(
      col("n_codes_used") < 1 || col("n_codes_used") > 256 ||
        col("sum_err255_sq") < 0).count()
    assert(bad == 0)
  }

  test("distortion sums and code words are partition-invariant") {
    val a = ScalarQuant.sqCodes(spark, sf).localCheckpoint()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = ScalarQuant.sqCodes(spark, sf)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
