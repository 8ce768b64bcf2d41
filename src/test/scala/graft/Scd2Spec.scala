package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.{Events, TextAnalysis}

/** SCD-2 interval build + proximity search: closed-form island cases,
  * interval-chain invariants, and the search-strictness ladder. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("islands: A A B A encodes to three chained intervals") {
    val ev = Seq(
      (1L, "A", ts(10), 1L),
      (1L, "A", ts(20), 2L),
      (1L, "B", ts(30), 3L),
      (1L, "A", ts(40), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Events.scd2Of(ev)
      .orderBy("valid_from")
      .select("event_type", "valid_from", "valid_to", "n_events")
      .as[(String, Timestamp, Option[Timestamp], Long)].collect().toSeq
    assert(got == Seq(
      ("A", ts(10), Some(ts(30)), 2L),
      ("B", ts(30), Some(ts(40)), 1L),
      ("A", ts(40), None, 1L)))
  }

  test("timestamp tie across a type flip stays a total chain") {
    val ev = Seq(
      (1L, "A", ts(10), 1L),
      (1L, "B", ts(10), 2L) // same ts — event_id breaks the tie
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Events.scd2Of(ev)
      .select("event_type", "is_current").as[(String, Boolean)]
      .collect().toSet
    assert(got == Set(("A", false), ("B", true)))
  }

  test("fixture invariants: one current per user, counts conserve") {
    val s = Events.scd2Of(Tables.events(spark, sf)).localCheckpoint()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(s.filter(col("is_current")).count() == users)
    assert(s.filter(col("valid_to") < col("valid_from")).count() == 0)
    val total = Tables.events(spark, sf).count()
    assert(s.agg(sum("n_events")).head().getLong(0) == total)
  }

  test("search ladder: proximity hits are a subset of conjunctive hits") {
    val prox = TextAnalysis.proximitySearch(spark, sf)
    val and = TextAnalysis.postingsAnd(spark, sf)
      .select("doc_id").distinct()
    val orphan = prox.select("doc_id").distinct()
      .join(and, Seq("doc_id"), "left_anti").count()
    assert(orphan == 0, "NEAR/8 can only match where AND matches")
    assert(prox.filter(col("min_dist") > 8 || col("n_pairs") < 1)
      .count() == 0)
  }
}
