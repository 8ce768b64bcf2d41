package graft

import graft.ext.Communities

/** Pins the synchronous-LPA and k-core-peel recurrences against
  * independent from-scratch folds on hand graphs, plus partition
  * invariance of the corpus gates. */
class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  /** Independent synchronous LPA fold (plurality label, ties → min). */
  private def lpaRef(und: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = und ++ und.map(_.swap)
    val nbrs = dir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = dir.map(_._1).distinct
    var lab: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to Communities.LpaRounds) {
      lab = nodes.map { n =>
        val counts = nbrs(n).map(lab).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        // total order: (count DESC, label ASC)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  /** Independent peel fold: survivors + degree at admission. */
  private def kcoreRef(und: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = und ++ und.map(_.swap)
    var nodes = dir.map(_._1).distinct.toSet
    var deg: Map[Long, Long] = Map.empty
    for (_ <- 1 to Communities.PeelRounds) {
      deg = dir.filter(e => nodes(e._1) && nodes(e._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      nodes = deg.filter(_._2 >= Communities.CoreK).keySet
    }
    deg.filter(_._2 >= Communities.CoreK)
  }

  private def lpaRows(und: Seq[(Long, Long)]): Map[Long, Long] =
    Communities.communitiesOf(und.toDF("part_a", "part_b"))
      .as[(Long, Long)].collect().toMap

  private def kcoreRows(und: Seq[(Long, Long)]): Map[Long, Long] =
    Communities.kcoreOf(und.toDF("part_a", "part_b"))
      .as[(Long, Long)].collect().toMap

  test("LPA: two triangles joined by a bridge collapse to two communities") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), // triangle A
      (4L, 5L), (4L, 6L), (5L, 6L),           // triangle B
      (3L, 4L))                               // bridge
    val got = lpaRows(g)
    assert(got == lpaRef(g))
    // Structure: each triangle agrees on one label, and the two
    // communities are distinct.
    assert(got(1L) == got(2L))
    assert(got(5L) == got(6L))
    assert(got(1L) != got(5L))
  }

  test("LPA: star adopts the hub's plurality dynamics deterministically") {
    // Star 1-{2,3,4,5}: leaves see only the hub; the hub sees four
    // leaf labels and the (count DESC, label ASC) order must break the
    // 4-way tie to the smallest — pinned via the independent fold.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(lpaRows(g) == lpaRef(g))
  }

  test("kcore: triangle survives, pendant chain peels over two rounds") {
    // Chain 4-5-6 hangs off triangle 1-2-3: node 6 peels in round 1,
    // THEN 5 (degree fell to 1), then 4 — multi-round peeling that a
    // single degree filter would get wrong.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = kcoreRows(g)
    assert(got == kcoreRef(g))
    assert(got.keySet == Set(1L, 2L, 3L), s"2-core must be the triangle: $got")
    assert(got.values.forall(_ == 2L))
  }

  test("kcore: K4 is its own 2-core, degrees intact") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = kcoreRows(g)
    assert(got == kcoreRef(g))
    assert(got.keySet == Set(1L, 2L, 3L, 4L) && got.values.forall(_ == 3L))
  }

  test("degenerate graphs: empty edge frame, single edge") {
    val empty = Seq.empty[(Long, Long)].toDF("part_a", "part_b")
    assert(Communities.communitiesOf(empty).collect().isEmpty)
    assert(Communities.kcoreOf(empty).collect().isEmpty)
    // One edge IS the bipartite oscillator from the scaladoc: each
    // endpoint adopts the other's label every round, so after an even
    // round count both are back at their own id — the fixed-round
    // semantics make that the defined answer, and the independent fold
    // agrees. The 2-core is empty (each endpoint has degree 1 < 2).
    val one = Seq((7L, 3L)).toDF("part_a", "part_b")
    assert(lpaRows(Seq((7L, 3L))) == lpaRef(Seq((7L, 3L))))
    assert(lpaRows(Seq((7L, 3L))) == Map(7L -> 7L, 3L -> 3L))
    assert(Communities.kcoreOf(one).collect().isEmpty)
  }

  test("corpus gates are shuffle-partition invariant") {
    // Drive the un-memoized seams: the gates now ride a sessionMemo'd
    // label checkpoint, whose second read would make this vacuous.
    def lpaCorpus() = Communities.communitiesOf(
      ext.Basket.copurchase(spark, sf).select($"part_a", $"part_b"))
      .orderBy("part").collect().map(_.toString).toSeq
    val a = lpaCorpus()
    val k = Communities.partsKcore(spark, sf).orderBy("part")
      .collect().map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val b = lpaCorpus()
      val k2 = Communities.partsKcore(spark, sf).orderBy("part")
        .collect().map(_.toString).toSeq
      assert(a == b, "label trajectory must not depend on parallelism")
      assert(k == k2, "peel trajectory must not depend on parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("modularity: two bridged triangles, exact rational Q") {
    // m=7; LPA splits the graph into the two triangles; each community
    // has e_in=3 and deg_sum=7 ⇒ q_num = 4·7·3 − 49 = 35 per community,
    // Q = (35+35)/(4·49) = 5/14.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val pairs = g.toDF("part_a", "part_b")
    val labels = Communities.communitiesOf(pairs)
      .withColumnRenamed("part", "part")
    val rows = Communities.modularityOf(pairs, labels)
      .orderBy("community").collect()
    assert(rows.length == 2, rows.mkString(","))
    for (r <- rows) {
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("e_in") == 3L)
      assert(r.getAs[Long]("deg_sum") == 7L)
      assert(r.getAs[Long]("q_num") == 35L)
      assert(r.getAs[Double]("q_contrib") == 35.0 / 196.0)
    }
    // Global Q from exact numerators: Σ q_num / 4m² = 70/196 = 5/14.
    assert(rows.map(_.getAs[Long]("q_num")).sum == 70L)
  }

  test("assortativity: star is maximally disassortative, cycle degenerate") {
    // Star 0-{1,2,3}: every edge joins deg-3 to deg-1. M=6, Σjk=6·3=18,
    // Σj=6·(3+1)/1=12, Σj²=6·(9+1)/...: per directed edge j∈{3,1} with
    // the hub on one side: Σj = 3·3+3·1 = 12, Σj² = 3·9+3·1 = 30,
    // Σjk = 6·3 = 18 ⇒ r = (6·18−144)/(6·30−144) = −36/36 = −1.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("part_a", "part_b")
    val s = Communities.assortativityOf(star).collect().head
    assert(s.getAs[Long]("r_num") == -36L && s.getAs[Long]("r_den") == 36L)
    assert(s.getAs[Double]("assortativity") == -1.0)
    // A cycle is 2-regular: r_den = 0 ⇒ NULL, not NaN.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("part_a", "part_b")
    val c = Communities.assortativityOf(cyc).collect().head
    assert(c.getAs[Long]("r_den") == 0L)
    assert(c.isNullAt(c.fieldIndex("assortativity")))
  }

  test("modularity: single community covering everything scores 0") {
    // All nodes in one label ⇒ e_in = m, deg_sum = 2m ⇒
    // q_num = 4m·m − 4m² = 0 exactly.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val pairs = g.toDF("part_a", "part_b")
    val labels = Seq((1L, 9L), (2L, 9L), (3L, 9L))
      .toDF("part", "community")
    val rows = Communities.modularityOf(pairs, labels).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("q_num") == 0L)
    assert(rows.head.getAs[Double]("q_contrib") == 0.0)
  }
}
