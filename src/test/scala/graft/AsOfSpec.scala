package graft

import java.sql.Timestamp

import graft.ext.AsOf

/** As-of join edge semantics: equal timestamps match, later right rows
  * don't, keys without any prior right row drop (inner), and the latest
  * of several candidates wins. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s:00")

  test("picks latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, 10L, ts("10:00")), // equal-ts right row must match
      (2L, 10L, ts("11:30")), // latest of two candidates
      (3L, 20L, ts("09:00")), // right rows exist but all later -> drop
      (4L, 30L, ts("12:00"))) // no right rows for key -> drop
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("10:00"), "a"),
      (10L, ts("11:00"), "b"),
      (10L, ts("12:00"), "c"),
      (20L, ts("09:30"), "x"))
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v", "rt"))
      .select("event_id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b"))
  }

  test("forward: picks earliest right row at-or-after each left time, per key") {
    val left = Seq(
      (1L, 10L, ts("12:00")), // equal-ts right row must match (inclusive)
      (2L, 10L, ts("10:30")), // earliest of two later candidates
      (3L, 20L, ts("10:00")), // right rows exist but all earlier -> drop
      (4L, 30L, ts("12:00"))) // no right rows for key -> drop
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("10:00"), "a"),
      (10L, ts("11:00"), "b"),
      (10L, ts("12:00"), "c"),
      (20L, ts("09:30"), "x"))
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoinForward(left, right, "k", "rk", "t", "rt",
      Seq("v", "rt")).select("event_id", "v").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "c", 2L -> "b"))
  }

  test("forward and backward agree with a brute-force fold on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val lDf = left.toDF("event_id", "k", "t")
    // dedupe right per (k, t) to max v — the determinism precondition
    val rSeq = right.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val rDf = rSeq.toDF("rk", "rt", "v")
    val back = AsOf.asofJoin(lDf, rDf, "k", "rk", "t", "rt", Seq("v"))
      .select("event_id", "v").as[(Long, Long)].collect().toMap
    val fwd = AsOf.asofJoinForward(lDf, rDf, "k", "rk", "t", "rt", Seq("v"))
      .select("event_id", "v").as[(Long, Long)].collect().toMap
    val wantBack = left.flatMap { case (id, k, t) =>
      val c = rSeq.filter(r => r._1 == k && r._2 <= t)
      if (c.isEmpty) None else Some(id -> c.maxBy(r => (r._2, r._3))._3)
    }.toMap
    val wantFwd = left.flatMap { case (id, k, t) =>
      val c = rSeq.filter(r => r._1 == k && r._2 >= t)
      if (c.isEmpty) None else Some(id -> c.minBy(r => (r._2, -r._3))._3)
    }.toMap
    assert(back == wantBack)
    assert(fwd == wantFwd)
  }

  test("matched row with a null value stays the match (no stitching)") {
    // right: (t=1, v="x"), (t=2, v=null). A left row at t=3 must match
    // the t=2 row and see v=null — NOT carry "x" forward from t=1.
    val left = Seq((1L, 10L, ts("10:03"))).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("10:01"), Some("x")),
      (10L, ts("10:02"), Option.empty[String]))
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v", "rt"))
      .select("event_id", "v", "rt")
      .as[(Long, Option[String], java.sql.Timestamp)].collect()
    assert(got.toSeq == Seq((1L, None, ts("10:02"))))
  }

  test("rejects rightVals that collide with left columns") {
    val left = Seq((1L, 10L, ts("10:00"), "mine")).toDF("event_id", "k", "t", "v")
    val right = Seq((10L, ts("09:00"), "theirs")).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("rejects caller columns named like the internal working columns") {
    val left = Seq((1L, 10L, ts("10:00"), "oops")).toDF("event_id", "k", "t", "__side")
    val right = Seq((10L, ts("09:00"), "x")).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("__side"))
  }
}
