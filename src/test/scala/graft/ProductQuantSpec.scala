package graft

import org.apache.spark.sql.functions._

import graft.ext.{Hashing, ProductQuant}

/** Product quantization: the codebook seeds must reconstruct themselves
  * exactly, assignment mass must conserve, code words must pack into 32
  * bits, and the payload must be partition-invariant. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  test("codebook seed vectors have zero reconstruction error") {
    // Each codebook is sliced from the 16 smallest-idHash vectors, so in
    // every subspace those vectors sit exactly on a centroid: their total
    // PQ reconstruction error must be exactly 0.
    val seeds = Tables.embeddings(spark, sf)
      .orderBy(Hashing.idHash(col("vec_id")), col("vec_id"))
      .limit(16).select("vec_id").as[Long].collect().toSet
    val errs = ProductQuant.pqCodes(spark, sf)
      .filter(col("vec_id").isin(seeds.toSeq: _*))
      .select("recon_err").as[Long].collect()
    assert(errs.length == 16 && errs.forall(_ == 0L),
      s"seed recon errors: ${errs.mkString(",")}")
  }

  test("code words pack 8x4 bits; report conserves assignment mass") {
    val codes = ProductQuant.pqCodes(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(codes.length == n)
    assert(codes.forall { r =>
      val w = r.getAs[Long]("code_word")
      w >= 0L && w < (1L << 32) && r.getAs[Long]("recon_err") >= 0L
    })
    val report = ProductQuant.pqReport(spark, sf).collect()
    assert(report.forall { r =>
      r.getAs[Long]("sub") >= 0 && r.getAs[Long]("sub") < 8 &&
        r.getAs[Long]("code") >= 0 && r.getAs[Long]("code") < 16
    })
    // Every vector is assigned in every subspace: per-sub counts each sum
    // to the corpus size.
    val perSub = report.groupBy(_.getAs[Long]("sub"))
      .view.mapValues(_.map(_.getAs[Long]("n_assigned")).sum).toMap
    assert(perSub.size == 8 && perSub.values.forall(_ == n))
  }

  test("residual codebooks beat raw codebooks on total distortion") {
    import org.apache.spark.sql.functions.sum
    val raw = ProductQuant.pqReport(spark, sf)
      .agg(sum("total_err")).head().getLong(0)
    val res = ProductQuant.pqResidualReport(spark, sf)
      .agg(sum("total_err")).head().getLong(0)
    // The IVFADC claim, measured: encoding residuals against the coarse
    // quantizer concentrates mass near the origin, so the same 4-bit
    // budget quantizes tighter.
    assert(res < raw, s"residual err $res !< raw err $raw")
    // Mass conserved: every (vector, subspace) assigned exactly once.
    val n = Tables.embeddings(spark, sf).count() * 8
    assert(ProductQuant.pqResidualReport(spark, sf)
      .agg(sum("n_assigned")).head().getLong(0) == n)
  }

  test("pq payload is shuffle-partition invariant") {
    val a = ProductQuant.pqCodes(spark, sf).collect().map(_.toString).sorted
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val b = ProductQuant.pqCodes(spark, sf).collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
