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
  * Scale shape: tokenization + island ids are per-doc window work on
  * the doc_id clustering; word stats are map-side-combinable aggs on
  * the word key (vocabulary-sized); the phrase table aggregates by
  * phrase text (bounded by distinct phrases). The stopword list is
  * the English kernel list — a compile-time constant both engines
  * embed. */
object Rake {

  val TopK = 50
  /** Phrases longer than this are boilerplate runs, not keyphrases
    * (standard RAKE practice caps candidate length). */
  val MaxPhraseLen = 4

  private lazy val stopsEn: Seq[String] =
    TextAnalysis.stopwords.toMap.apply("en")

  /** (doc_id, phrase_id, word) exploded candidate-phrase frame. */
  private def phraseWords(spark: SparkSession, sfDir: String): DataFrame = {
    val stopsArr = array(stopsEn.map(lit): _*)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as(Seq("pos", "word")))
      .withColumn("is_stop", array_contains(stopsArr, col("word")))
      .withColumn("brk", when(col("is_stop"), 1L).otherwise(0L))
      .withColumn("phrase_id",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("phrase_id"), col("pos"), col("word"))
  }

  def keyphrases(spark: SparkSession, sfDir: String): DataFrame = {
    val pw = phraseWords(spark, sfDir).localCheckpoint() // 3 consumers
    // Phrase text must be position-ordered deterministically:
    // sort_array over (pos, word) structs, then project the words.
    val phraseText = pw
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(array_join(expr("transform(sort_array(collect_list(" +
        "struct(pos, word))), s -> s.word)"), " ").as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= MaxPhraseLen)
      .localCheckpoint() // word-stats join + phrase aggregation
    val wordStats = pw
      .join(phraseText.select(col("doc_id"), col("phrase_id"), col("plen")),
        Seq("doc_id", "phrase_id"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score_milli", expr("(1000 * deg) div freq"))
    val scored = pw
      .join(phraseText.select(col("doc_id"), col("phrase_id"),
        col("phrase"), col("plen")), Seq("doc_id", "phrase_id"))
      .join(wordStats.select(col("word"), col("score_milli")), "word")
      .groupBy(col("doc_id"), col("phrase_id"), col("phrase"))
      .agg(sum(col("score_milli")).as("score_milli"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        // every occurrence of a phrase text scores identically (same
        // words -> same word scores), so MIN is just a deterministic
        // pick of that shared value
        min(col("score_milli")).as("score_milli"))
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
