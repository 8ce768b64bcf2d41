package graft

import org.apache.spark.sql.functions._

import graft.ext.KnnEval

/** k-NN label-vote invariants on the fixture. */
class KnnEvalSpec extends SparkSpec {

  private lazy val out = KnnEval.knnLabelVote(spark, sf)

  test("one row per probe; votes bounded by K; labels from the corpus") {
    assert(out.count() == KnnEval.QuerySampleN)
    assert(out.select("vec_a").distinct().count() == KnnEval.QuerySampleN)
    assert(out.filter(col("votes") < 1 || col("votes") > KnnEval.K)
      .count() == 0)
    val known = Tables.embeddings(spark, sf)
      .select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val used = out.select(col("predicted_label")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(known))
  }

  test("correct flag is consistent with the label columns") {
    assert(out.filter(col("correct") =!=
      (col("true_label") === col("predicted_label"))).count() == 0)
  }

  test("prediction is the plurality: no label outvotes the winner") {
    // Reconstruct the vote table independently and check the winner's
    // count is the max (with the (votes DESC, label) tie order).
    import org.apache.spark.sql.expressions.Window
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long").as("lab"))
    val w = Window.partitionBy(col("vec_a"))
      .orderBy(col("cos").desc, col("vec_b"))
    val nn = graft.ext.Similarity.cosinePairs(spark, sf, KnnEval.QuerySampleN)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnEval.K)
    val maxVotes = nn.join(labels, col("vec_b") === col("vec_id"))
      .groupBy(col("vec_a"), col("lab")).agg(count(lit(1)).as("v"))
      .groupBy(col("vec_a")).agg(max(col("v")).as("vmax"))
    val bad = out.join(maxVotes, Seq("vec_a"))
      .filter(col("votes") =!= col("vmax"))
    assert(bad.count() == 0)
  }
}
