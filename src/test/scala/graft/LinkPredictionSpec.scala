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

  test("capped-mode Jaccard stays in [0, 1000] despite asymmetric caps") {
    // Adversarial shape from the round-9 advisory: middles m keep both
    // endpoints a, b in their capped lists while a's and b's own capped
    // lists drop the middles (stronger edges win), so cn = 5 exceeds
    // da + db = 4 and the unclamped denominator would be -1, yielding a
    // negative score. a=1, b=2; strong fillers x=10,11 / y=20,21
    // (weight 100); middles 30..34 (weight 1); cap 2.
    val edges = (Seq((1L, 10L, 100L), (1L, 11L, 100L),
        (2L, 20L, 100L), (2L, 21L, 100L)) ++
      (30L to 34L).flatMap(m => Seq((1L, m, 1L), (2L, m, 1L))))
      .toDF("part_a", "part_b", "n_orders")
    val nbrs = edges.select(col("part_a").as("node"), col("part_b").as("nbr"),
        col("n_orders").as("w"))
      .union(edges.select(col("part_b"), col("part_a"), col("n_orders")))
    val preds = LinkPrediction.predictionsOf(nbrs, edges, 2)
      .localCheckpoint()
    val ab = preds.filter(col("part_a") === 1 && col("part_b") === 2)
      .select("common_neighbors", "jaccard_e3")
      .as[(Long, Long)].collect()
    assert(ab.length == 1 && ab(0)._1 == 5L,
      s"expected the a-b wedge with cn=5, got ${ab.mkString(",")}")
    assert(preds.filter(col("jaccard_e3") < 0 || col("jaccard_e3") > 1000)
      .count() == 0, "capped-mode Jaccard escaped [0, 1000]")
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
