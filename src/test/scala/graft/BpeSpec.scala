package graft

import scala.collection.mutable

import graft.ext.Bpe

/** BPE merge learning: the distributed unrolled rounds must equal an
  * independent sequential reference implementation (clear-box oracle),
  * and hand-computed merges on a classic tiny corpus are pinned. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook sequential BPE: word types with counts -> first M merges.
    * Deliberately written with plain collections, independent of the
    * DataFrame formulation. */
  private def referenceBpe(words: Map[String, Long],
      m: Int): Seq[(String, String, Long)] = {
    var seqs: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = mutable.Buffer[(String, String, Long)]()
    for (_ <- 1 to m) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((syms, c) <- seqs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        seqs = seqs.groupMapReduce { case (syms, _) =>
          // left-to-right non-overlapping merge
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("hand-pinned merges on the classic BPE example corpus") {
    // low x5, lower x2, newest x6, widest x3 (Sennrich et al.'s example):
    // 'es' (6+3=9) then 'est' (9) then 'lo' (5+2=7) ...
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = Bpe.mergesOf(words.toDF("word", "cnt"))
      .orderBy("merge_rank")
      .select("left_piece", "right_piece", "pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(got.take(3) == Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)),
      s"unexpected merge trajectory: $got")
    assert(got == referenceBpe(words.toMap, Bpe.NumMerges))
  }

  test("overlapping-run merges are left-to-right non-overlapping") {
    // 'aaaa' x1: pair (a,a) count 3; merge -> aa|aa (NOT a|aa|a or aa|a|a
    // double-count). Next round pair (aa,aa) count 1.
    val words = Seq(("aaaa", 1L), ("b", 1L))
    val got = Bpe.mergesOf(words.toDF("word", "cnt"))
      .orderBy("merge_rank")
      .select("left_piece", "right_piece", "pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(got.head == (("a", "a", 3L)))
    assert(got(1) == (("aa", "aa", 1L)))
    assert(got == referenceBpe(words.toMap, Bpe.NumMerges))
  }

  test("pair exhaustion is a fixed point, not an emptied state table") {
    // The same corpus runs out of adjacent pairs after round 2; rounds
    // 3..8 must leave the word states untouched (an eager cross join
    // against the empty winner used to wipe them, zeroing the vocab
    // report exactly when NumMerges exceeds the available rounds).
    val words = Seq(("aaaa", 1L), ("b", 1L))
    val (merges, fin) = Bpe.runMerges(words.toDF("word", "cnt"))
    assert(merges.count() == 2, "merge table should stop at exhaustion")
    val seqs = fin.select("cnt", "seq").as[(Long, String)].collect().toSet
    assert(seqs == Set((1L, "|aaaa"), (1L, "|b")),
      s"post-exhaustion state wrong: $seqs")
  }

  test("vocab report: pieces are chars-or-learned-merges, mass reconciles") {
    val vocab = Bpe.corpusBpeVocab(spark, sf).collect()
    assert(vocab.nonEmpty)
    val merged = Bpe.corpusBpeMerges(spark, sf)
      .select("merged").as[String].collect().toSet
    vocab.foreach { r =>
      val p = r.getAs[String]("piece")
      assert(p.length == r.getAs[Long]("piece_len"))
      assert(p.length == 1 || merged.contains(p),
        s"piece '$p' is neither a char nor a learned merge")
    }
    assert(vocab.exists(_.getAs[Long]("piece_len") > 1),
      "no multi-char piece survived — vocab report vacuous")
    // Token mass reconciles with an independent recompute: total symbol
    // positions weighted by word frequency after replaying the merges.
    val wordCounts = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.engine.Tokenizer.tokens(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")),
          graft.ext.TextAnalysis.LowerWordPattern)).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    var seqs: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toVector -> c }
    for ((l, r, _) <- referenceBpe(wordCounts, Bpe.NumMerges)) {
      seqs = seqs.groupMapReduce { case (syms, _) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }(_._2)(_ + _)
    }
    val wantMass = seqs.map { case (syms, c) => syms.length * c }.sum
    assert(vocab.map(_.getAs[Long]("token_mass")).sum == wantMass)
  }

  test("corpus merges equal the sequential reference at sf0.001") {
    val wordCounts = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.engine.Tokenizer.tokens(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")),
          graft.ext.TextAnalysis.LowerWordPattern)).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    val want = referenceBpe(wordCounts, Bpe.NumMerges)
    val got = Bpe.corpusBpeMerges(spark, sf)
      .orderBy("merge_rank")
      .select("left_piece", "right_piece", "pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(got == want, s"distributed $got != reference $want")
    assert(got.size == Bpe.NumMerges)
  }

  test("both BPE reports ride one session learn run (memo seam)") {
    // r17 optimization: corpus_bpe_merges and corpus_bpe_vocab share the
    // 8-round learn loop through one Frames.sessionMemo frame. Another
    // suite in the shared session may already have built it — assert
    // existence + stability, not first-build (the copurchase test's
    // discipline).
    val before = graft.ext.Frames.buildsOf("bpe_run")
    Bpe.corpusBpeMerges(spark, sf).count()
    val afterFirst = graft.ext.Frames.buildsOf("bpe_run")
    // buildsOf is monotone, so ">= before" was vacuous (r17 advisory);
    // pin the memo contract instead: at most ONE build in this test.
    assert(afterFirst >= 1 && afterFirst - before <= 1)
    // Repeated gate runs (the bench's reps) and the SECOND report must
    // both reuse the learned artifacts, not re-run the merge rounds.
    Bpe.corpusBpeVocab(spark, sf).count()
    Bpe.corpusBpeMerges(spark, sf).count()
    assert(graft.ext.Frames.buildsOf("bpe_run") == afterFirst)
  }
}
