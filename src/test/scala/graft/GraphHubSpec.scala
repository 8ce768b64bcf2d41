package graft

import org.apache.spark.sql.functions.col
import graft.ext.{Bfs, PageRank}

/** Planted high-degree hub probes for the graph family — the graph
  * analog of the mega-basket guard: a celebrity node must not detonate
  * the candidate space. The wedge seam ([[PageRank.orientedWedges]])
  * makes the bound EXECUTABLE rather than a scaladoc claim. */
class GraphHubSpec extends SparkSpec {
  import spark.implicits._

  private val HubSpokes = 200L

  /** Canonical (a < b) star: hub 0 joined to 1..HubSpokes. */
  private def starEdges = (1L to HubSpokes).map(i => (0L, i)).toDF("a", "b")

  test("star hub builds ZERO wedges under degree orientation") {
    val (_, oriented, wedges) = PageRank.orientedWedges(starEdges)
    // Every spoke has degree 1, the hub HubSpokes — orientation points
    // all edges INTO the hub, so each spoke's out-degree is 1 and the
    // hub's is 0: no node pivots two legs. A naive adjacency self-join
    // would materialize C(200, 2) = 19 900 hub wedges.
    assert(wedges.count() == 0L)
    assert(oriented.filter(col("dst") =!= 0L).count() == 0L,
      "some edge escaped the hub orientation")
    // And the full query on the same graph: no triangles anywhere.
    val tri = PageRank.trianglesOf(starEdges)
    assert(tri.filter(col("triangles") =!= 0L).count() == 0L)
    assert(tri.count() == HubSpokes + 1)
  }

  test("hub + clique: wedge fan-out stays linear, counts stay exact") {
    // Hub 0 joined to 1..100 plus the triangle {1,2,3}: 4 triangles
    // total — (1,2,3) and the three through the hub.
    val edges = ((1L to 100L).map(i => (0L, i)) ++
      Seq((1L, 2L), (1L, 3L), (2L, 3L))).toDF("a", "b")
    val (_, _, wedges) = PageRank.orientedWedges(edges)
    // Out-degrees under (deg, id) order: node1 {2,3,0}, node2 {3,0},
    // node3 {0}, spokes {0} — wedges = C(3,2) + C(2,2·1) = 4, against
    // C(100,2) = 4 950 for the naive hub pivot.
    assert(wedges.count() == 4L)
    val tri = PageRank.trianglesOf(edges)
      .filter(col("triangles") > 0L)
      .select(col("part"), col("triangles")).as[(Long, Long)]
      .collect().toMap
    assert(tri == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("BFS through a hub stays bounded and exact") {
    // Any seed reaches the hub in <= 1 hop (if a spoke) and every other
    // node in <= 2; the frontier's one-round 200-node expansion must
    // dedupe instead of multiplying.
    val hops = Bfs.bfsHopsOf(
      starEdges.select(col("a").as("part_a"), col("b").as("part_b")))
      .select(col("part"), col("hop")).as[(Long, Long)].collect().toMap
    assert(hops.size == HubSpokes + 1, s"visited ${hops.size}")
    assert(hops.values.max <= 2L)
    // Exactly the star distances: seeds at 0, the hub at <=1, spokes 2.
    assert(hops(0L) <= 1L)
    assert(hops.count { case (n, h) => n != 0L && h == 0L } == Bfs.NumSeeds
      || hops(0L) == 0L)
  }
}
