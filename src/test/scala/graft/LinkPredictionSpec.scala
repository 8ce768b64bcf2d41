package graft

import org.apache.spark.sql.functions._

import graft.ext.{Basket, LinkPrediction}

/** Semantic + guard invariants for common-neighbor link prediction. */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("predicted pairs are never existing edges, and scores are sane") {
    val edges = Basket.copurchase(spark, sf)
      .select("part_a", "part_b")
    val out = LinkPrediction.linkPrediction(spark, sf)
    assert(out.count() > 0)
    val overlap = out.join(edges, Seq("part_a", "part_b")).count()
    assert(overlap == 0, "a predicted link already exists")
    // Jaccard is a permille in [0, 1000]; cn >= 1 by construction.
    assert(out.filter(col("jaccard_e3") < 0 ||
      col("jaccard_e3") > 1000 || col("common_neighbors") < 1).count() == 0)
    assert(out.filter(col("rank") > LinkPrediction.TopPredictions)
      .count() == 0)
  }

  test("planted hub: adjacency cap bounds wedge fan-out") {
    // Star: hub 0 with 200 spokes (edge weight descending so the cap
    // keeps a deterministic strongest-32 prefix), plus a disjoint
    // triangle 500-501-502 to prove untouched parts stay exact.
    val spokes = (1 to 200).map(i => (0L, i.toLong, (300 - i).toLong))
    val tri = Seq((500L, 501L, 5L), (500L, 502L, 5L), (501L, 502L, 5L))
    val edges = (spokes ++ tri).toDF("part_a", "part_b", "n_orders")
    val nbrs = edges.select(col("part_a").as("node"), col("part_b").as("nbr"),
        col("n_orders").as("w"))
      .union(edges.select(col("part_b"), col("part_a"), col("n_orders")))
    val preds = LinkPrediction.predictionsOf(nbrs, edges,
      LinkPrediction.MaxNeighbors)
    // Uncapped, the hub yields C(200,2)=19900 spoke-pair wedges; capped,
    // only its strongest MaxNeighbors spokes (lowest ids — weights
    // descend with id) pair, thinned to top-5 per lesser endpoint.
    val spokePairs = preds.filter(col("part_a") >= 1 && col("part_b") <= 200)
    assert(spokePairs.count() > 0)
    val involved = spokePairs.select(explode(array(col("part_a"),
      col("part_b"))).as("p")).distinct()
      .filter(col("p") > LinkPrediction.MaxNeighbors).count()
    assert(involved == 0, "a spoke outside the strongest-cap set produced wedges")
    // The disjoint triangle is complete — no new links predictable there.
    assert(preds.filter(col("part_a") >= 500).count() == 0)
  }

  test("cap is a no-op on the corpus graph (max degree below the cap)") {
    val edges = Basket.copurchase(spark, sf)
    val maxDeg = edges.select(col("part_a").as("n"))
      .union(edges.select(col("part_b")))
      .groupBy("n").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxDeg <= LinkPrediction.MaxNeighbors,
      s"fixture degree $maxDeg exceeds cap — oracle equality would break")
  }
}
