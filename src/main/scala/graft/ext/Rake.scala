package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** RAKE keyphrase extraction (Rose et al. 2010, public) — corpus-level
  * keyphrases from stopword-delimited candidate phrases: tokenize,
  * split each document at stopwords into maximal content-word runs
  * (gaps-and-islands on the token stream), score every word by
  * degree/frequency (degree = Σ phrase length over the phrases
  * containing it — co-occurrence breadth; frequency = its phrase
  * occurrences), and score a phrase as the sum of its words' scores.
  *
  * Exactness: the word score deg/freq is rational, and summing exact
  * fractions across a phrase needs a product denominator — so the
  * gate uses the FLOORED-MILLI convention: score_milli(w) =
  * (1000·deg) div freq, phrase score = Σ score_milli — every term an
  * exact integer, identical truncation on both engines (the permille
  * discipline applied to RAKE; the ranking this induces differs from
  * float RAKE only inside sub-milli ties). Top [[TopK]] phrases by
  * (score DESC, phrase) total order.
  *
  * Scale shape: candidate phrases come straight out of the fused
  * [[graft.functions.HashKernels.phraseRuns]] kernel — one codegen'd
  * pass per document, zero shuffle — instead of the
  * posexplode + per-doc-window island-id + collect_list
  * reconstruction, which exchanged one row per corpus TOKEN (the
  * dominant sf10 cost of this key). Word stats are
  * map-side-combinable aggs on the word key (vocabulary-sized); the
  * phrase score is computed once per DISTINCT phrase text (every
  * occurrence of a text scores identically), so the word-score join
  * touches the distinct-phrase table, not the occurrence table. The
  * stopword list is the English kernel list — a compile-time
  * constant both engines embed. The DuckDB oracle keeps the
  * independent gaps-and-islands window formulation, so the gate
  * cross-checks the kernel against a from-first-principles rewrite. */
object Rake {

  val TopK = 50
  /** Phrases longer than this are boilerplate runs, not keyphrases
    * (standard RAKE practice caps candidate length). */
  val MaxPhraseLen = 4

  private lazy val stopsEn: Seq[String] =
    TextAnalysis.stopwords.toMap.apply("en")

  def keyphrases(spark: SparkSession, sfDir: String): DataFrame = {
    // One phrase-occurrence row per kernel-emitted run; the kernel
    // already lowercases, tokenizes [a-z]+, splits at stopwords and
    // space-joins — no token rows, no island window.
    val occ = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.GraftFunctions.phraseRuns(
        col("text"), stopsEn)).as("phrase"))
      .withColumn("plen", size(split(col("phrase"), " ")).cast("long"))
      .filter(col("plen") <= MaxPhraseLen)
      .localCheckpoint() // word-stats pass + occurrence-count pass
    val wordStats = occ
      .select(explode(split(col("phrase"), " ")).as("word"), col("plen"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score_milli", expr("(1000 * deg) div freq"))
    // Every occurrence of a phrase text scores identically (same words
    // -> same word scores), so score once per DISTINCT text: count
    // occurrences first, then explode only the distinct-phrase words
    // into the vocabulary join.
    val scored = occ.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("word", explode(split(col("phrase"), " ")))
      .join(wordStats.select(col("word"), col("score_milli")), "word")
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(sum(col("score_milli")).as("score_milli"))
    // TakeOrdered top-K first (distributed), THEN the rank window over
    // the K-row result — never a global window on the full phrase table.
    val top = scored.orderBy(col("score_milli").desc, col("phrase"))
      .limit(TopK)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_milli").desc, col("phrase"))))
      .select(col("rank").cast("long").as("rank"), col("phrase"),
        col("n_occurrences"), col("score_milli"))
  }

  val keyphrasesSql: String = {
    val stops = stopsEn.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |      AS word,
       |    CAST(unnest(range(1, len(regexp_extract_all(lower(text),
       |      '[a-z]+')) + 1)) AS BIGINT) AS pos
       |  FROM documents),
       |m AS (SELECT doc_id, word, pos,
       |    list_contains($stops, word) AS is_stop
       |  FROM tok),
       |isl AS (SELECT doc_id, word, pos,
       |    CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS phrase_id, is_stop
       |  FROM m),
       |pw AS (SELECT doc_id, phrase_id, pos, word FROM isl
       |  WHERE NOT is_stop),
       |pt AS (SELECT doc_id, phrase_id,
       |    string_agg(word, ' ' ORDER BY pos) AS phrase,
       |    CAST(COUNT(*) AS BIGINT) AS plen
       |  FROM pw GROUP BY 1, 2
       |  HAVING COUNT(*) <= $MaxPhraseLen),
       |ws AS (SELECT pw.word, CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(pt.plen) AS BIGINT) AS deg
       |  FROM pw JOIN pt USING (doc_id, phrase_id) GROUP BY 1),
       |wsc AS (SELECT word, (1000 * deg) // freq AS score_milli FROM ws),
       |psc AS (SELECT pw.doc_id, pw.phrase_id, pt.phrase,
       |    CAST(SUM(wsc.score_milli) AS BIGINT) AS score_milli
       |  FROM pw JOIN pt USING (doc_id, phrase_id)
       |          JOIN wsc ON pw.word = wsc.word
       |  GROUP BY 1, 2, 3),
       |agg AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |    CAST(MIN(score_milli) AS BIGINT) AS score_milli
       |  FROM psc GROUP BY 1),
       |rk AS (SELECT phrase, n_occurrences, score_milli,
       |    CAST(row_number() OVER (ORDER BY score_milli DESC, phrase)
       |      AS BIGINT) AS rank
       |  FROM agg)
       |SELECT rank, phrase, n_occurrences, score_milli
       |FROM rk WHERE rank <= $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_keyphrases_rake" -> (keyphrases _))

  val oracles: Map[String, String] = Map(
    "text_keyphrases_rake" -> keyphrasesSql)
}
