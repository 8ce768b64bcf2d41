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
}
