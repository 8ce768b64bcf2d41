package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ext.TextAnalysis
import graft.functions.{GraftFunctions => GF, TextKernels}

/** The one-pass text-statistic kernels must equal the regex/HOF
  * formulations the DuckDB oracles state — pinned on the real corpus and
  * on generated ASCII strings. */
class TextParitySpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("ngram lang-id: better than chance on the corpus; matrix reconciles") {
    import spark.implicits._
    val pred = TextAnalysis.langIdNgram(spark, sf)
    val n = pred.count()
    val hits = pred.filter(col("is_match")).count()
    val nLangs = pred.select("lang").distinct().count()
    assert(hits.toDouble / n > 1.2 / nLangs,
      s"trigram classifier at/below chance: $hits/$n over $nLangs langs")
    // Confusion matrix mass equals the doc count; shares sum to 1/class.
    val conf = TextAnalysis.langIdNgramConfusion(spark, sf).collect()
    assert(conf.map(_.getAs[Long]("n_docs")).sum == n)
    conf.groupBy(_.getAs[String]("lang")).values.foreach { rows =>
      assert(math.abs(rows.map(_.getAs[Double]("class_share")).sum - 1.0) < 1e-9)
    }
  }

  test("lm surprisal: exact bit arithmetic, rare words score higher") {
    import spark.implicits._
    val rows = TextAnalysis.lmSurprisal(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // Independent recompute of the bit measure from raw word counts.
    val words = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0))).as("word"))
      .as[(Long, String)].collect()
    val cnt = words.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val total = cnt.values.sum
    def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val want = words.groupBy(_._1).map { case (id, ws) =>
      id -> ws.map { case (_, w) => fl2(total) - fl2(cnt(w)) }.sum
    }
    rows.foreach { case (id, nw, bits, mmb) =>
      assert(bits == want.getOrElse(id, 0L), s"doc $id surprisal mismatch")
      assert(mmb == (if (nw == 0) 0L else bits * 1000 / nw))
    }
    // Non-vacuous: the corpus's rare word ('dup') makes scores differ.
    assert(rows.map(_._4).distinct.length > 1, "surprisal is constant — vacuous")
  }

  test("bm25: matches a driver-side recompute, ranks the rare term hits first") {
    import spark.implicits._
    val got = TextAnalysis.bm25TopK(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // Independent BM25 from raw words: same integer pipeline, no Spark.
    val words = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0))).as("word"))
      .as[(Long, String)].collect()
    val tf = words.groupBy(identity).map { case ((id, w), xs) =>
      (id, w) -> xs.length.toLong }
    val dl = words.groupBy(_._1).map { case (id, xs) => id -> xs.length.toLong }
    val dfm = tf.keys.toSeq.groupBy(_._2).map { case (w, xs) =>
      w -> xs.length.toLong }
    val s = dl.values.sum; val n = dl.size.toLong
    def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val terms = dfm.toSeq.sortBy { case (w, d) => (d, w) }.take(4)
    val want = terms.flatMap { case (term, df) =>
      val idfBits = fl2((2 * n + 1) / (2 * df + 1))
      val hits = tf.collect { case ((id, w), t) if w == term =>
        val tfp = (1000L * 22 * t * s) / (10 * s * t + 3 * s + 9 * dl(id) * n)
        (id, t, tfp, idfBits * tfp)
      }.toSeq
      hits.sortBy { case (id, _, _, sc) => (-sc, id) }.take(10).zipWithIndex
        .map { case ((id, t, tfp, sc), i) =>
          (term, i + 1L, id, t, dl(id), df, idfBits, tfp, sc) }
    }.toSet
    assert(got.toSet == want)
    // Non-vacuous: the rare planted term reaches a positive idf level,
    // so at least one term's ranking is tf-driven, not tie-broken.
    assert(got.exists(_._9 > 0), "all scores zero — idf collapsed")
  }

  test("lm heldout: split, backoff branches, and totals match a recompute") {
    import spark.implicits._
    val got = TextAnalysis.lmHeldout(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.nonEmpty)
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0)).as("ws"))
      .as[(Long, Seq[String])].collect()
    def ih(id: Long) = ((id % 2147483647L) * 40503L + 12345L) % 2147483647L
    def bgs(ws: Seq[String]) = ws.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq
    val train = toks.filter(t => ih(t._1) % 2 == 0).flatMap(t => bgs(t._2))
    val bc = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pc = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val uc = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = train.size.toLong
    def lb(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x) // len(bin)
    val want = toks.filter(x => ih(x._1) % 2 == 1).map { case (id, ws) =>
      val bs = bgs(ws).map { bg =>
        bc.get(bg) match {
          case Some(c) => (lb(pc(bg._1)) - lb(c)).toLong -> 0L
          case None => (2L + lb(t) - uc.get(bg._2).map(lb).getOrElse(0)) -> 1L
        }
      }
      val (sb, oov) = (bs.map(_._1).sum, bs.map(_._2).sum)
      val n = bs.size.toLong
      id -> ((n, oov, sb, if (n == 0) 0L else sb * 1000 / n))
    }.toMap
    assert(got == want)
    // Non-vacuous: both backoff branches fire somewhere on the corpus.
    assert(got.values.exists(_._2 > 0), "no OOV bigrams — backoff untested")
    assert(got.values.exists(v => v._2 < v._1), "all OOV — seen path untested")
  }

  test("rrf: fused order matches a driver-side recompute of all 3 rankers") {
    import spark.implicits._
    val got = TextAnalysis.searchRrf(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // Independent recompute: BM25 stats from raw words, three rank
    // orders, integer-micros fusion.
    val words = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0))).as("word"))
      .as[(Long, String)].collect()
    val tf = words.groupBy(identity).map { case ((id, w), xs) =>
      (id, w) -> xs.length.toLong }
    val dl = words.groupBy(_._1).map { case (id, xs) => id -> xs.length.toLong }
    val dfm = tf.keys.toSeq.groupBy(_._2).map { case (w, xs) =>
      w -> xs.length.toLong }
    val s = dl.values.sum; val n = dl.size.toLong
    def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val terms = dfm.toSeq.sortBy { case (w, d) => (d, w) }.take(4)
    val want = terms.flatMap { case (term, df) =>
      val idfBits = fl2((2 * n + 1) / (2 * df + 1))
      val hits = tf.collect { case ((id, w), t) if w == term =>
        val tfp = (1000L * 22 * t * s) / (10 * s * t + 3 * s + 9 * dl(id) * n)
        (id, t, idfBits * tfp)
      }.toSeq
      def rankBy[A: Ordering](key: ((Long, Long, Long)) => A): Map[Long, Long] =
        hits.sortBy(h => (key(h), h._1)).zipWithIndex
          .map { case (h, i) => h._1 -> (i + 1L) }.toMap
      val rB = rankBy { case (_, _, sc) => -sc }
      val rT = rankBy { case (_, t, _) => -t }
      val rL = rankBy { case (id, _, _) => dl(id) }
      def rrf(id: Long) = 1000000L / (60 + rB(id)) +
        1000000L / (60 + rT(id)) + 1000000L / (60 + rL(id))
      hits.map(_._1).sortBy(id => (-rrf(id), id)).take(10).zipWithIndex
        .map { case (id, i) =>
          (term, i + 1L, id, rB(id), rT(id), rL(id), rrf(id)) }
    }.toSet
    assert(got.toSet == want)
    // Non-vacuous: the rankers genuinely disagree somewhere (otherwise
    // fusion degenerates to any single order and proves nothing).
    assert(got.exists(r => r._4 != r._5 || r._4 != r._6),
      "all three rankers identical — fusion vacuous")
  }

  test("postings AND + phrase search match driver recomputes") {
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0)).as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    // Conjunctive search: the two rarest terms, docs containing both.
    val dfm = toks.toSeq.flatMap(_._2.distinct).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val qts = dfm.toSeq.sortBy { case (w, d) => (d, w) }.take(2).map(_._1)
    val wantAnd = (for {
      (id, ws) <- toks.toSeq if qts.forall(ws.contains)
      t <- qts
    } yield (id, t, ws.count(_ == t).toLong)).toSet
    val gotAnd = TextAnalysis.postingsAnd(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    assert(gotAnd == wantAnd)
    assert(gotAnd.nonEmpty, "the rare-term pair matches no document")
    // Phrase search: most frequent bigram, adjacent-position counts.
    val bigrams = toks.toSeq.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.length == 2).map(p => id -> p.mkString(" ")) }
    val (phrase, _) = bigrams.map(_._2).groupBy(identity)
      .map { case (b, xs) => b -> xs.length }
      .toSeq.sortBy { case (b, c) => (-c, b) }.head
    val wantPh = bigrams.filter(_._2 == phrase).groupBy(_._1)
      .map { case (id, xs) => (id, phrase, xs.length.toLong) }.toSet
    val gotPh = TextAnalysis.phraseSearch(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    assert(gotPh == wantPh)
    assert(gotPh.exists(_._3 > 1) || gotPh.nonEmpty)
  }

  test("bigram surprisal: exact conditional bits, short docs surface with zeros") {
    import spark.implicits._
    val rows = TextAnalysis.lmBigramSurprisal(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // Independent recompute: conditional bits from raw transition counts.
    val seqs = docs.select(col("doc_id"),
      filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
        t => length(t) > lit(0)).as("ws"))
      .as[(Long, Seq[String])].collect()
    val bgs = seqs.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.length == 2).map(p => (id, (p(0), p(1))))
    }
    val cnt = bgs.groupBy(_._2).map { case (bg, xs) => bg -> xs.length.toLong }
    val pcnt = cnt.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val want = bgs.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, bg) => fl2(pcnt(bg._1)) - fl2(cnt(bg)) }.sum
    }
    rows.foreach { case (id, nb, bits, mmb) =>
      assert(bits == want.getOrElse(id, 0L), s"doc $id bigram surprisal mismatch")
      assert(mmb == (if (nb == 0) 0L else bits * 1000 / nb))
    }
    // Every doc (including < 2-word docs) has a row; counts reconcile.
    assert(rows.length == seqs.length)
    val nShort = seqs.count(_._2.length < 2)
    assert(rows.count(_._2 == 0L) == nShort)
    // Conditional bits are non-negative by construction and non-constant.
    assert(rows.forall(_._3 >= 0L))
    assert(rows.map(_._4).distinct.length > 1, "bigram surprisal constant — vacuous")
  }

  test("kernels == regex formulations on the corpus") {
    val words = filter(split(lower(col("text")), TextAnalysis.LowerWordPattern),
      t => length(t) > lit(0))
    val mismatches = docs.select(
      GF.wsTokenCount(col("text")).as("a1"),
      size(filter(split(col("text"), TextAnalysis.WsPattern),
        t => length(t) > lit(0))).cast("long").as("b1"),
      GF.bpePieceCount(col("text")).as("a2"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.BpePattern), lit(0)))
        .cast("long").as("b2"),
      GF.punctCount(col("text")).as("a3"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.PunctPattern), lit(0)))
        .cast("long").as("b3"),
      GF.letterCount(col("text")).as("a4"),
      aggregate(transform(words, w => length(w).cast("long")),
        lit(0L), (acc, x) => acc + x).as("b4"),
      GF.wordCount(col("text")).as("a5"),
      size(words).cast("long").as("b5"),
      GF.stopwordCount(col("text"), lit("en")).as("a6"),
      size(filter(words, t => array_contains(
        array(TextKernels.stopwords.toMap.apply("en").map(lit): _*), t)))
        .cast("long").as("b6"))
      .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
        col("a3") =!= col("b3") || col("a4") =!= col("b4") ||
        col("a5") =!= col("b5") || col("a6") =!= col("b6"))
      .count()
    assert(mismatches == 0)
  }

  test("normalizeWs kernel == regexp_replace(lower) on the corpus") {
    val n = docs.select(
      GF.normalizeWs(col("text")).as("a"),
      regexp_replace(lower(col("text")), "\\s+", " ").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("property: kernels == JVM regex reference on generated ASCII text") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '\'', '-', '0'))).map(_.mkString)
    for (_ <- 1 to 300) {
      val s = gen.sample.getOrElse("")
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      assert(TextKernels.wsTokenCount(u) ==
        s.split("\\s+").count(_.nonEmpty).toLong, s"ws '$s'")
      assert(TextKernels.bpePieceCount(u) ==
        ("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]".r.findAllIn(s).size).toLong, s"bpe '$s'")
      assert(TextKernels.punctCount(u) ==
        ("[^a-zA-Z0-9\\s]".r.findAllIn(s).size).toLong, s"punct '$s'")
      assert(TextKernels.letterCount(u) ==
        s.count(_.isLetter).toLong, s"letters '$s'")
      assert(TextKernels.wordCount(u) ==
        s.toLowerCase.split("[^a-z]+").count(_.nonEmpty).toLong, s"words '$s'")
      val en = TextKernels.stopwords.toMap.apply("en").toSet
      assert(TextKernels.stopwordCount(u,
        org.apache.spark.unsafe.types.UTF8String.fromString("en")) ==
        s.toLowerCase.split("[^a-z]+").count(en.contains).toLong, s"stop '$s'")
    }
  }

  test("PRF expansion: ranks match a driver recompute from the seed docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = ext.TextAnalysis.searchPrfExpansion(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5)).toMap
    assert(got.nonEmpty)
    // Seed docs from the gated BM25 ranking; pool + rank by hand.
    val top = ext.TextAnalysis.bm25TopK(spark, sf)
      .select("term", "rnk", "doc_id")
      .as[(String, Long, Long)].collect()
      .filter(_._2 <= 3)
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"),
        split(lower(col("text")), "[^a-z]+").as("ws"))
      .as[(Long, Seq[String])].collect()
      .map { case (d, ws) => d -> ws.filter(_.nonEmpty).toSet }.toMap
    val df = words.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity[String]).view.mapValues(_.size.toLong).toMap
    got.foreach { case (term, rows) =>
      assert(rows.map(_._5).toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"$term ranks")
      assert(rows.forall(_._2 != term), s"$term must not expand to itself")
      val seeds = top(term)
      val cand = words.collect {
        case (d, ws) if seeds(d) => ws - term
      }.flatten.groupBy(identity[String]).view
        .mapValues(_.size.toLong).toMap
      val want = cand.toSeq
        .map { case (w, fb) => (w, fb, df(w)) }
        .sortBy { case (w, fb, d) => (-fb, d, w) }.take(5)
        .map { case (w, fb, d) => (term, w, fb, d) }
      assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq == want,
        s"$term expansion diverged:\n got=$rows\nwant=$want")
    }
  }
}
