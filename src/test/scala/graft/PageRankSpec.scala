package graft

import org.apache.spark.sql.functions._

import graft.ext.PageRank

/** Pins the integer PageRank recurrence against a from-scratch fold on
  * a hand-sized graph, plus partition invariance on the corpus gate. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // Undirected: triangle 1-2-3 plus pendant 4 attached to 1.
  private val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
  private val edges = (und ++ und.map(_.swap))
    .toDF("src", "dst")

  private def reference(): Map[Long, Long] = {
    val dir: Seq[(Long, Long)] = und ++ und.map(_.swap)
    val nodes: Seq[Long] = dir.map(_._1).distinct
    val deg: Map[Long, Long] =
      dir.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var pr: Map[Long, Long] = nodes.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to PageRank.Iters) {
      val incoming = dir.groupBy(_._2)
      pr = nodes.map { v =>
        val s = incoming(v).map { case (u, _) => pr(u) / deg(u) }.sum
        v -> (PageRank.Scale * 15L / 100L + 85L * s / 100L)
      }.toMap
    }
    pr
  }

  test("integer recurrence matches an independent fold exactly") {
    val got = PageRank.pagerankOf(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == reference())
    // structure sanity: the hub out-ranks the pendant
    assert(got(1L) > got(4L))
  }

  test("corpus gate is shuffle-partition invariant") {
    val a = PageRank.partsPagerank(spark, sf).orderBy("part")
      .collect().map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val b = PageRank.partsPagerank(spark, sf).orderBy("part")
        .collect().map(_.toString).toSeq
      assert(a == b, "rank trajectory must not depend on parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def triRows(es: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    PageRank.trianglesOf(es.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("triangles: hand graphs — clique, path, pendant") {
    // K4: every node deg 3, in 3 triangles, lcc exactly 1.
    val k4 = triRows(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(k4.keySet == Set(1L, 2L, 3L, 4L))
    assert(k4.values.forall(_ == ((3L, 3L, 1000L))))
    // Path 1-2-3: zero triangles everywhere, middle node deg 2.
    val path = triRows(Seq((1L, 2L), (2L, 3L)))
    assert(path(2L) == ((2L, 0L, 0L)) && path(1L) == ((1L, 0L, 0L)))
    // Triangle {1,2,3} plus pendant edge 3-4: node 3 has deg 3 but only
    // one closed wedge of its three -> lcc floor(2000/6) = 333.
    val pend = triRows(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(pend(3L) == ((3L, 1L, 333L)))
    assert(pend(4L) == ((1L, 0L, 0L)))
    assert(pend(1L) == ((2L, 1L, 1000L)))
  }

  test("triangles: corpus gate == driver brute force over all edges") {
    val es = graft.ext.Basket.copurchase(spark, sf)
      .select($"part_a", $"part_b").as[(Long, Long)].collect()
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val triOf = adj.map { case (n, nb) =>
      n -> nb.toSeq.combinations(2).count { case Seq(x, y) =>
        adj(x).contains(y) }.toLong
    }
    val got = PageRank.partsTriangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (part, deg, tri, lcc) =>
      assert(deg == adj(part).size.toLong, s"deg($part)")
      assert(tri == triOf(part), s"triangles($part)")
      assert(lcc == (if (deg > 1) 2000 * tri / (deg * (deg - 1)) else 0L))
    }
    assert(got.map(_._1).toSet == adj.keySet)
  }
}
