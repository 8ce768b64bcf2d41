package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Quality}

/** Centroid drift + IQR fences: closed-form invariants. */
class DriftIqrSpec extends SparkSpec {
  import spark.implicits._

  test("iqr quartiles land at the exact type-1 ranks per language") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect()
    val got = Quality.iqrOutliers(spark, sf)
      .select("lang", "q1", "q3").distinct()
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty)
    docs.groupBy(_._2).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      val n = sorted.length.toLong
      val q1 = sorted(((n + 3) / 4 - 1).toInt)
      val q3 = sorted(((3 * n + 3) / 4 - 1).toInt)
      assert(got(lang) == ((q1, q3)), s"lang $lang quartiles")
    }
  }

  test("iqr fences flag exactly the Tukey-rule rows") {
    val rows = Quality.iqrOutliers(spark, sf)
      .select("n_chars", "q1", "q3", "outlier_low", "outlier_high")
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (x, q1, q3, lo, hi) =>
      assert(lo == (2 * x < 2 * q1 - 3 * (q3 - q1)))
      assert(hi == (2 * x > 2 * q3 + 3 * (q3 - q1)))
      assert(!(lo && hi))
    }
  }

  test("centroid drift on an i.i.d. split is small relative to the scale") {
    val rows = Clustering.centroidDrift(spark, sf)
      .select("label", "n_a", "n_b", "drift")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, na, nb, d) =>
      assert(na > 0 && nb > 0 && d >= 0)
      // drift is the full 64-dim L2 distance between half-centroids in
      // quantized units. A typical VECTOR norm here is ~2e4; an i.i.d.
      // split of n per half shifts the centroid by ~norm/sqrt(n)
      // (a few thousand at the fixture's n≈25/half), far below the
      // norm itself — a systematic shift would be norm-scale.
      assert(d < 8000.0, s"drift $d is vector-norm-scale: not an " +
        "i.i.d.-split shift")
    }
    // Drift is symmetric in the halves by construction (|a.s*nb - b.s*na|)
    // — checked implicitly by the oracle hash; here check magnitudes vary
    // by label (a constant would suggest a broadcast bug).
    assert(rows.map(_._4).distinct.length > 1)
  }
}
