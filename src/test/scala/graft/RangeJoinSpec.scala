package graft

import graft.ext.RangeJoin

/** Generic intervalJoin semantics vs a brute-force oracle, including
  * negative (pre-1970) epoch times where truncating division would
  * mis-bin boundary rows — binStart floor-aligns via pmod. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("interval join == brute force, straddling zero and bin boundaries") {
    val w = 10L
    val ls = Seq((1L, -25L), (2L, -20L), (3L, -15L), (4L, -10L), (5L, -5L),
      (6L, -1L), (7L, 0L), (8L, 3L), (9L, 9L), (10L, 20L))
    val rs = Seq((101L, -21L), (102L, -12L), (103L, -10L), (104L, -9L),
      (105L, -5L), (106L, 0L), (107L, 1L), (108L, 10L), (109L, 19L),
      (110L, 31L))
    val left = ls.map { case (id, t) => (id, 1L, t) }.toDF("id_a", "k_a", "t_a")
    val right = rs.map { case (id, t) => (id, 1L, t) }.toDF("id_b", "k_b", "t_b")
    val got = RangeJoin.intervalJoin(left, right, "k_a", "k_b", "t_a", "t_b", w)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      (la, ta) <- ls
      (rb, tb) <- rs
      if tb >= ta && tb <= ta + w
    } yield (la, rb)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("keys partition the pair space") {
    val left = Seq((1L, 1L, 0L), (2L, 2L, 0L)).toDF("id_a", "k_a", "t_a")
    val right = Seq((10L, 1L, 5L), (20L, 2L, 5L)).toDF("id_b", "k_b", "t_b")
    val got = RangeJoin.intervalJoin(left, right, "k_a", "k_b", "t_a", "t_b", 10L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("rejects a caller column named __bin") {
    val left = Seq((1L, 1L, 0L)).toDF("id_a", "k_a", "__bin")
    val right = Seq((10L, 1L, 5L)).toDF("id_b", "k_b", "t_b")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(left, right, "k_a", "k_b", "__bin", "t_b", 10L)
    }
    assert(e.getMessage.contains("__bin"))
  }
}
