package graft

import org.apache.spark.sql.functions._

import graft.ext.Spell

/** SymSpell correction: the planted misspellings recover their
  * originals, and candidate generation is complete at distance 1. */
class SpellSpec extends SparkSpec {
  import spark.implicits._

  test("planted misspellings recover their source words") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val top = vocab.filter(length(col("word")) >= 4)
      .orderBy(col("c").desc, col("word"))
      .limit(Spell.NumQueries)
      .select("word", "c").as[(String, Long)].collect()
    val got = Spell.spellCorrect(spark, sf)
      .select("query", "correction", "dist")
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty)
    top.foreach { case (w, _) =>
      val q = w.substring(0, 1) + w.substring(2)
      assert(got.contains(q), s"no correction row for planted query $q")
      val (corr, dist) = got(q)
      // The misspelling is distance 1 from its source; the top-ranked
      // correction must be at distance <= 1 — and when the dropped-char
      // form is itself NOT a vocab word, distance exactly 1.
      assert(dist <= 1)
      val lev = {
        val (a, b) = (q, corr)
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      assert(lev.toLong == dist, s"reported distance wrong for $q -> $corr")
    }
  }

  test("every emitted correction is within edit distance 1 of its query") {
    val rows = Spell.spellCorrect(spark, sf)
      .select("query", "correction", "dist", "freq")
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._3 <= 1) && rows.forall(_._4 > 0))
    // One best row per query.
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
