package graft

import org.apache.spark.sql.functions._

import graft.ext.{Hits, Readability}

/** HITS trajectory vs a local exact reference; readability and lift
  * count invariants. */
class HitsReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("hits matches a local exact-integer reference on a toy graph") {
    // Bipartite: hub 1 points at {10, 11, 12}, hub 2 at {10}, hub 3 at
    // {11, 13}. Replay the scaled-Long recursion locally.
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 11L),
      (3L, 13L))
    val df = edges.toDF("src", "dst")
    val got = Hits.hitsOf(df)
      .select("node_type", "node", "score")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val S = Hits.Scale
    var a: Map[Long, Long] = edges.map(_._2).distinct.map(_ -> S).toMap
    var h: Map[Long, Long] = Map.empty
    for (_ <- 1 to Hits.Iters) {
      val hraw = edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap
      val hmax = hraw.values.max
      h = hraw.view.mapValues(v => v * S / hmax).toMap
      val araw = edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val amax = araw.values.max
      a = araw.view.mapValues(v => v * S / amax).toMap
    }
    h.foreach { case (n, s) => assert(got(("hub", n)) == s, s"hub $n") }
    a.foreach { case (n, s) =>
      assert(got(("authority", n)) == s, s"auth $n")
    }
    // Hub 1 (3 authoritative parts) must out-rank hub 2 (1 part).
    assert(got(("hub", 1L)) > got(("hub", 2L)))
  }

  test("hits scores are positive and bounded by the scale") {
    val rows = Hits.partsHits(spark, sf)
      .select("score").as[Long].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(s => s > 0 && s <= Hits.Scale))
    // Each round ends on a rescale by max, so max score == Scale on
    // both sides of the union.
    val maxes = Hits.partsHits(spark, sf)
      .groupBy("node_type").agg(max("score").as("mx"))
      .select("mx").as[Long].collect()
    assert(maxes.toSet == Set(Hits.Scale))
  }

  test("readability counts are exact on a known document") {
    val doc = Seq((1L, "The cat sat. It purred! Happy cat?"))
      .toDF("doc_id", "text")
    // words: the,cat,sat,it,purred,happy,cat = 7; sentences: 3 runs;
    // syllables (vowel groups): e,a,a,i,u,e,a,y,a = th[e] c[a]t s[a]t
    // [i]t p[u]rr[e]d h[a]pp[y] c[a]t = 9
    val r = Readability.readability(spark, sf).limit(0) // schema only
    val words = size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
    val got = doc.select(
      words.cast("long"),
      size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"),
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long")).as[(Long, Long, Long)].head()
    assert(got == ((7L, 3L, 9L)))
    assert(r.columns.toSeq == Seq("doc_id", "n_words", "n_sentences",
      "n_syllables", "fk_grade"))
  }

  test("bigram lift reconciles against raw pair counts") {
    val lift = Readability.bigramLift(spark, sf).localCheckpoint()
    val rows = lift.select("c_xy", "c_x", "c_y", "lift_num", "lift_den")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cxy, cx, cy, num, den) =>
      assert(cxy >= Readability.MinSupport)
      assert(cxy <= cx && cxy <= cy, "pair count exceeds a margin")
      assert(num % cxy == 0 && den % (cx * cy) == 0,
        "num/den not the documented products")
    }
    // A bigram's pair count can never exceed the total pair volume.
    val mPairs = Tables.documents(spark, sf)
      .select(expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .agg(sum(greatest(lit(0), size(col("ws")) - 1)).cast("long"))
      .as[Long].head()
    assert(rows.forall(_._1 <= mPairs))
  }

  test("hits frame is partition-invariant") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Hits.partsHits(spark, sf).localCheckpoint()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Hits.partsHits(spark, sf)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("past-the-gate SHJ round strategy (forced) equals the classic") {
    // r18: past the fact-row gate, the round joins hint SHUFFLE_HASH on
    // the node-score side (no edge sorts). Integer HITS is plan-
    // invariant, so the gated result must equal the below-gate one.
    val GateKey = "spark.graft.graph.shjRoundRowGate"
    val plain = Hits.partsHits(spark, sf).localCheckpoint()
    spark.conf.set(GateKey, "1")
    try {
      val gated = Hits.partsHits(spark, sf)
      assert(plain.exceptAll(gated).count() == 0 &&
        gated.exceptAll(plain).count() == 0)
    } finally spark.conf.unset(GateKey)
  }
}
