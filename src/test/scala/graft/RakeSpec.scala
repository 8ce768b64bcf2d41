package graft

import org.apache.spark.sql.functions._

import graft.ext.{Rake, TextAnalysis}

/** RAKE keyphrases: full local replay of the floored-milli scoring on
  * the fixture corpus. */
class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("gated top-K equals a from-scratch local RAKE replay") {
    val stops = TextAnalysis.stopwords.toMap.apply("en").toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    // Candidate phrases: maximal non-stopword runs, capped at MaxPhraseLen.
    val phrases = docs.flatMap { case (_, text) =>
      val words = "[a-z]+".r.findAllIn(text.toLowerCase).toVector
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      words.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs.filter(_.length <= Rake.MaxPhraseLen)
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val wScore = freq.keys.map(w => w -> 1000L * deg(w) / freq(w)).toMap
    val pScore = phrases.map(p => p.mkString(" ") -> p.map(wScore).sum)
    val agg = pScore.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.head._2)).toMap
    val want = agg.toSeq.sortBy { case (ph, (_, s)) => (-s, ph) }
      .take(Rake.TopK).zipWithIndex
      .map { case ((ph, (n, s)), i) => (i + 1L, ph, n, s) }.toSet

    val got = Rake.keyphrases(spark, sf)
      .select("rank", "phrase", "n_occurrences", "score_milli")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == want, "top-K keyphrase set diverges from local replay")
    assert(got.size == Rake.TopK)
  }

  test("no phrase contains a stopword and lengths respect the cap") {
    val stops = TextAnalysis.stopwords.toMap.apply("en").toSet
    val rows = Rake.keyphrases(spark, sf)
      .select("phrase").as[String].collect()
    assert(rows.nonEmpty)
    rows.foreach { p =>
      val ws = p.split(" ")
      assert(ws.length <= Rake.MaxPhraseLen)
      assert(!ws.exists(stops), s"stopword inside phrase '$p'")
    }
  }
}
