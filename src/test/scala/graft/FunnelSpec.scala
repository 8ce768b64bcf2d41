package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.Funnel

/** Pins the funnel's SEQUENTIAL semantics: each stage anchors to the
  * previous stage's timestamp with a strict >, not mere existence. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val cases = Seq(
    // (user, type, minute) — conversion window is 120 min
    (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 3),   // full chain → 3
    (2L, "click", 1), (2L, "view", 2), (2L, "purchase", 3),   // click BEFORE view → 1
    (3L, "view", 1), (3L, "purchase", 2), (3L, "click", 3),   // purchase before click → 2
    (4L, "error", 1),                                         // never entered → 0
    (5L, "view", 1), (5L, "click", 1),                        // same instant: strict > → 1
    (6L, "view", 1), (6L, "click", 2), (6L, "purchase", 2),   // purchase == click ts → 2
    (7L, "view", 5), (7L, "click", 2), (7L, "click", 6),      // later click rescues → 2
    (8L, "purchase", 1),                                      // purchase w/o chain → 0
    (9L, "view", 1), (9L, "click", 125),                      // click outside window → 1
    (10L, "view", 1), (10L, "click", 60), (10L, "purchase", 190), // purchase outside → 2
    (11L, "view", 1), (11L, "view", 100), (11L, "click", 130)) // ANY view entry → 2

  private val events = cases
    .map { case (u, t, m) => (u, t, ts(m)) }
    .toDF("user_id", "event_type", "ts")

  test("stage per user follows the windowed any-entry chain") {
    val got = Funnel.stagesOf(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L,
      5L -> 1L, 6L -> 2L, 7L -> 2L, 8L -> 0L,
      9L -> 1L, 10L -> 2L, 11L -> 2L))
  }

  test("gated rollup reconciles with per-user stages; reach is cumulative") {
    val users = Funnel.funnelUsers(spark, sf).collect()
      .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val report = Funnel.funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((stage, n, reached) <- report) {
      assert(n == users(stage), s"stage $stage count")
      assert(reached == users.filter(_._1 >= stage).values.sum, s"stage $stage reach")
    }
    // the corpus funnel is non-vacuous: the stage column differentiates
    // (at sf0.001 stages 1 AND 2 are populated; 3 appears from sf0.01)
    assert(users.getOrElse(2L, 0L) > 0, "no qualified clicks — vacuous gate")
    assert(users.size >= 2, "all users at one stage — vacuous gate")
  }
}
