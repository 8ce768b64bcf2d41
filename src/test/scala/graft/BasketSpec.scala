package graft

import org.apache.spark.sql.functions._

import graft.ext.Basket

/** Market-basket pairing: the mega-basket guard must fire on a planted
  * degenerate order (hard-bounding the C(k,2) fan-out) and be a proven
  * no-op on basket-bounded data — including the real gated corpus. */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  // Order 1 is the mega-basket (parts 1..40); orders 2 and 3 are sane
  // identical baskets so their pairs reach support 2.
  private lazy val planted = (
    (1 to 40).map(p => (1L, p.toLong)) ++
      Seq((2L, 100L), (2L, 101L), (2L, 102L)) ++
      Seq((3L, 100L), (3L, 101L), (3L, 102L))
  ).toDF("l_orderkey", "l_partkey")

  test("guard fires: mega-basket truncated to its smallest MaxBasket keys") {
    val pairs = Basket.copurchaseOf(planted, maxBasket = 10, minSupport = 1L)
      .collect()
    // Order 1 contributes C(10,2) pairs over parts 1..10 only; every
    // pair touching a truncated part (>10) from order 1 is gone.
    val mega = pairs.filter(_.getAs[Long]("part_a") <= 40)
      .filterNot(r => r.getAs[Long]("part_a") >= 100)
    assert(mega.length == 45, s"expected C(10,2)=45 capped pairs, got ${mega.length}")
    assert(mega.forall(r => r.getAs[Long]("part_b") <= 10))
    // The sane baskets are untouched: 3 pairs at support 2.
    val sane = pairs.filter(_.getAs[Long]("part_a") >= 100)
    assert(sane.length == 3)
    assert(sane.forall(_.getAs[Long]("n_orders") == 2))
  }

  test("guard is a no-op below the cap") {
    val capped = Basket.copurchaseOf(planted, maxBasket = 64, minSupport = 1L)
      .collect().map(_.toString).sorted
    val uncapped = Basket.copurchaseOf(planted, maxBasket = Int.MaxValue,
      minSupport = 1L).collect().map(_.toString).sorted
    assert(capped.sameElements(uncapped))
    // Full fan-out present when nothing exceeds the cap: C(40,2) + 3·2-support.
    assert(capped.length == 780 + 3)
  }

  test("similar items: corpus top-k matches an independent Jaccard fold") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().distinct
    val orders = li.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    val pairs = Basket.copurchase(spark, sf)
      .select(col("part_a"), col("part_b"), col("n_orders"))
      .as[(Long, Long, Long)].collect()
    val want = (pairs ++ pairs.map { case (a, b, n) => (b, a, n) })
      .groupBy(_._1).toSeq.flatMap { case (p, recs) =>
        recs.map { case (_, r, nBoth) =>
          val j = 1000L * nBoth /
            (orders(p).size + orders(r).size - nBoth)
          (p, r, nBoth, j)
        }.sortBy { case (_, r, _, j) => (-j, r) }.take(5).zipWithIndex
          .map { case ((pp, r, nBoth, j), i) => (pp, r, nBoth, j, i + 1L) }
      }.toSet
    val got = Basket.similarItems(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // Jaccard sanity: a pair's similarity never exceeds 1000 permille.
    assert(got.forall { case (_, _, _, j, _) => j >= 0 && j <= 1000 })
  }

  test("gated corpus result identical with and without the guard") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val guarded = Basket.copurchase(spark, sf).collect().map(_.toString).sorted
    val plain = Basket.copurchaseOf(li, Int.MaxValue, Basket.MinSupport)
      .collect().map(_.toString).sorted
    assert(guarded.sameElements(plain),
      "cap altered results on basket-bounded data — corpus has a mega-basket?")
  }

  test("association rules reconcile with the pair and margin counts") {
    val rules = Basket.basketRules(spark, sf)
      .select("antecedent", "consequent", "n_ab", "n_a", "n_b",
        "support_ppm", "confidence_ppm", "lift_num", "lift_den")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rules.nonEmpty)
    rules.foreach { case (_, _, nAb, nA, nB, sup, conf, num, den) =>
      assert(nAb <= nA && nAb <= nB, "pair count exceeds a margin")
      assert(sup >= 0 && sup <= 1000000 && conf > 0 && conf <= 1000000)
      assert(num % nAb == 0 && den % nA == 0)
    }
    // Every supported pair yields exactly two directed rules, and the
    // reverse rule shares n_ab and the lift fraction.
    val byPair = rules.groupBy(r => (math.min(r._1, r._2),
      math.max(r._1, r._2)))
    assert(byPair.values.forall(_.length == 2))
    byPair.values.foreach { case Array(r1, r2) =>
      assert(r1._3 == r2._3 && r1._8 == r2._8 && r1._9 == r2._9)
    }
  }
}
