package graft

import org.apache.spark.sql.functions._

import graft.ext.{Experiment, Hashing}

/** A/B readout invariants: cells partition the users, assignment is
  * sticky, and the chi-square matches a driver-side recompute. */
class ExperimentSpec extends SparkSpec {

  private lazy val row = Experiment.abTest(spark, sf).collect()(0)

  test("2x2 cells partition the user population") {
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(row.getAs[Long]("n_users") == users)
    assert(row.getAs[Long]("a") + row.getAs[Long]("b") +
      row.getAs[Long]("c") + row.getAs[Long]("d") == users)
  }

  test("arm assignment is a pure function of user_id (both arms in use)") {
    val arms = Tables.events(spark, sf)
      .select(col("user_id"), (Hashing.idHash(col("user_id")) % 2).as("arm"))
      .distinct()
    // One arm per user — a user appearing under both arms would mean a
    // non-deterministic splitter.
    val multi = arms.groupBy("user_id").count().filter(col("count") > 1)
    assert(multi.count() == 0)
    assert(arms.select("arm").distinct().count() == 2)
  }

  test("chi-square matches a driver-side recompute from the cells") {
    val (a, b, c, d) = (row.getAs[Long]("a"), row.getAs[Long]("b"),
      row.getAs[Long]("c"), row.getAs[Long]("d"))
    val n = (a + b + c + d).toDouble
    val diff = (a * d - b * c).toDouble
    val expect =
      if (a + b == 0 || c + d == 0 || a + c == 0 || b + d == 0) 0.0
      else n * diff * diff /
        ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
    assert(row.getAs[Double]("chi2") == expect)
    assert(row.getAs[Double]("chi2") >= 0.0)
  }

  test("streaming twin lands on the identical readout row") {
    val batch = Experiment.abTest(spark, sf).collect()(0)
    val stream = graft.streaming.Streaming.abTestStream(spark, sf)
      .collect()(0)
    assert(stream.toSeq == batch.toSeq)
  }

  test("conversion permilles agree with the cells") {
    val (a, b, c, d) = (row.getAs[Long]("a"), row.getAs[Long]("b"),
      row.getAs[Long]("c"), row.getAs[Long]("d"))
    assert(row.getAs[Long]("conv_a_permille") ==
      (if (a + b == 0) 0L else a * 1000 / (a + b)))
    assert(row.getAs[Long]("conv_b_permille") ==
      (if (c + d == 0) 0L else c * 1000 / (c + d)))
  }
}
