package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Readability scoring and bigram association mining — two corpus
  * signals a curation stack runs next to the Gopher-style rule gates:
  *
  *  - Flesch–Kincaid grade per document from three exact integer
  *    counts (words, sentence-terminal punctuation runs, vowel-group
  *    syllable estimate — the standard regex approximation). The
  *    grade itself (0.39·w/s + 11.8·sy/w − 15.59) is a handful of
  *    IEEE ops on those exact integers, identical expression shape on
  *    both engines ⇒ bit-identical doubles.
  *  - Bigram LIFT (the log-free monotone twin of PMI: lift =
  *    P(xy)/(P(x)·P(y)) = c_xy·N² / (M·c_x·c_y)) over adjacent word
  *    pairs, min-support 5 — collocation mining ("machine learning"
  *    vs chance co-occurrence) with EXACT integer numerator and
  *    denominator emitted beside the double ratio, the
  *    [[Events.trendOls]] cleared-denominator convention. PMI itself
  *    would need libm log — the one thing this codebase never gates;
  *    lift orders identically (log is monotone), so nothing is lost.
  *
  * Long headroom: N² ≈ 9·10¹⁰ at sf0.1 word volume (3·10⁵), ×c_xy
  * ≤ 10⁴ ⇒ ~10¹⁵, Long-safe; a 10⁹-word corpus recasts the two
  * products to decimal(38,0) — same plan shape.
  *
  * Scale shape: readability is pure map-side kernel work in the
  * document scan (no shuffle at all); lift is one posexplode →
  * two map-side-combinable counts (bigram, unigram) + a 1-row totals
  * broadcast + two dimension-sized joins keyed on the words — the
  * [[TextAnalysis]] tfidf discipline. */
object Readability {

  /** Min bigram support — below this, lift is sampling noise. */
  val MinSupport = 5L

  def readability(spark: SparkSession, sfDir: String): DataFrame = {
    val words = size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      .cast("long")
    val sents = greatest(lit(1L),
      size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
    val sylls = greatest(lit(1L),
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        sylls.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("fk_grade",
        lit(0.39) * (col("n_words").cast("double") /
          col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")) - lit(15.59))
  }

  val readabilitySql: String =
    """WITH c AS (SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
      |      AS n_words,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
      |      AS BIGINT) AS n_sentences,
      |    CAST(greatest(1, len(regexp_extract_all(lower(text),
      |      '[aeiouy]+'))) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
      |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
      |    - 15.59 AS fk_grade
      |FROM c WHERE n_words > 0""".stripMargin

  /** Adjacent-pair collocations with exact lift. Tokens are the
    * lowercase [a-z]+ runs in document order. */
  def bigramLift(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .localCheckpoint() // feeds unigram counts, bigram counts, totals
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // joined twice (left word, right word)
    val bi = toks
      .select(explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))"))
        .as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= MinSupport)
    val totals = toks.agg(
      sum(size(col("ws")).cast("long")).as("n_words"),
      sum(greatest(lit(0), size(col("ws")) - 1).cast("long")).as("m_pairs"))
    bi.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        (col("c_xy") * col("n_words") * col("n_words")).as("lift_num"),
        (col("m_pairs") * col("c_x") * col("c_y")).as("lift_den"))
      .withColumn("lift",
        col("lift_num").cast("double") / col("lift_den").cast("double"))
  }

  val bigramLiftSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |uni AS (SELECT unnest(ws) AS w FROM toks),
       |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
       |bp AS (SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
       |  FROM toks, unnest(range(len(ws) - 1)) AS t(i)),
       |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
       |  FROM bp GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport),
       |tot AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uc) AS n_words,
       |  (SELECT CAST(SUM(greatest(0, len(ws) - 1)) AS BIGINT) FROM toks)
       |    AS m_pairs)
       |SELECT b.w1, b.w2, b.c_xy, x.c AS c_x, y.c AS c_y,
       |  b.c_xy * t.n_words * t.n_words AS lift_num,
       |  t.m_pairs * x.c * y.c AS lift_den,
       |  CAST(b.c_xy * t.n_words * t.n_words AS DOUBLE)
       |    / CAST(t.m_pairs * x.c * y.c AS DOUBLE) AS lift
       |FROM bc b JOIN uc x ON b.w1 = x.w JOIN uc y ON b.w2 = y.w, tot t"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_readability" -> (readability _),
    "corpus_bigram_lift" -> (bigramLift _))

  val oracles: Map[String, String] = Map(
    "quality_readability" -> readabilitySql,
    "corpus_bigram_lift" -> bigramLiftSql)
}
