package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * Catalyst built-ins / higher-order functions — no UDFs — so column
  * pruning reaches the scan and the per-row work distributes trivially
  * (no shuffle at all for per-doc outputs; these pipelines are
  * embarrassingly parallel at 100 TB).
  *
  * Cross-engine determinism: every number is either an exact integer
  * count or a fixed-shape double expression over exact integers, so the
  * DuckDB oracle matches bit-for-bit.
  */
object TextAnalysis {

  // Shared regex vocabulary (ASCII classes only: Java and RE2 agree).
  val WsPattern = "\\s+"
  val BpePattern = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]" // word pieces + lone punct
  val PunctPattern = "[^a-zA-Z0-9\\s]"
  val LowerWordPattern = "[^a-z]+"

  /** Per-language stopword lists for the stopword language-ID heuristic.
    * Single source of truth (shared with the counting kernel and the
    * generated oracle SQL) lives in graft.functions.TextKernels. */
  val stopwords: Seq[(String, Seq[String])] =
    graft.functions.TextKernels.stopwords

  /** Exact per-document counting stats — each a one-pass codegen'd
    * kernel (TextParitySpec pins equivalence to the regex formulations
    * the oracle SQL uses). */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions._
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      wsTokenCount(col("text")).as("n_ws_tokens"),
      bpePieceCount(col("text")).as("n_bpe_pieces"),
      punctCount(col("text")).as("n_punct"),
      letterCount(col("text")).as("sum_word_len"))
  }

  val textStatsSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_pieces,
       |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
       |  CAST(list_sum(list_prepend(0::BIGINT, list_transform(
       |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> ''),
       |    w -> CAST(length(w) AS BIGINT)))) AS BIGINT) AS sum_word_len
       |FROM documents""".stripMargin

  /** Quality scoring: stopword / punctuation / length signals combined
    * into one deterministic [0,1] score (identical expression shape in
    * the oracle, so double bits match). */
  /** The one quality-score formula, shared by the flat gate and the
    * per-language percentile calibration below. */
  // private[graft]: the streaming curation twin scores the same formula
  // over an unbounded frame.
  private[graft] def qualityScoreCol: org.apache.spark.sql.Column = {
    import graft.functions.GraftFunctions._
    val nWords = wordCount(col("text"))
    val stopRatio = stopwordCount(col("text"), lit("en")).cast("double") /
      nWords.cast("double")
    val punctRatio = punctCount(col("text")).cast("double") /
      length(col("text")).cast("long").cast("double")
    val lenSignal = least(lit(1.0), nWords.cast("double") / 100.0)
    stopRatio * 0.4 + (lit(1.0) - punctRatio) * 0.3 + lenSignal * 0.3
  }

  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions._
    val nWords = wordCount(col("text"))
    val nStop = stopwordCount(col("text"), lit("en"))
    val nPunct = punctCount(col("text"))
    val nChars = length(col("text")).cast("long")
    val stopRatio = nStop.cast("double") / nWords.cast("double")
    val punctRatio = nPunct.cast("double") / nChars.cast("double")
    Tables.documents(spark, sfDir).select(
      col("doc_id"), nWords.as("n_words"), nStop.as("n_stopwords"),
      stopRatio.as("stopword_ratio"), punctRatio.as("punct_ratio"),
      qualityScoreCol.as("quality_score"))
  }

  /** Per-LANGUAGE percentile calibration of the quality score — the
    * step that makes one threshold comparable across languages: the
    * raw score's scale shifts with a language's stopword list and
    * orthography, so "drop the bottom 20%" must be a within-language
    * rank, not a global cutoff. rank_pm = rank·1000 div n (permille,
    * integer — no float percentile convention to disagree on), ranked
    * by (score, doc_id) so ties break totally and both engines pick
    * identical ranks; keep = top 80% per language.
    *
    * Scale shape: score is map-side kernel work in the same scan that
    * carries lang (no self-join back to documents); ONE exchange on
    * lang serves both window functions (rank + per-lang count). At
    * 100 TB a single-language skew shard is the binding constraint —
    * rank-within-lang is a sort per language partition, the same cost
    * class as any per-key ordered window. */
  def qualityPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    val ordered = byLang.orderBy(col("quality_score"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), qualityScoreCol.as("quality_score"))
      .withColumn("rank", row_number().over(ordered).cast("long"))
      .withColumn("n", count(lit(1)).over(byLang))
      .select(col("doc_id"), col("lang"), col("rank"),
        expr("rank * 1000 div n").as("rank_pm"),
        (expr("rank * 1000 div n") >= 200L).as("keep"))
  }

  // lazy: textQualitySql is declared below — an eager val here would
  // interpolate null at object-init order.
  lazy val qualityPercentileSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, lang, quality_score
       |  FROM (SELECT d.lang, tq.* FROM ($textQualitySql) tq
       |        JOIN documents d USING (doc_id))),
       |r AS (SELECT doc_id, lang,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY quality_score, doc_id) AS BIGINT) AS rank,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM q)
       |SELECT doc_id, lang, rank,
       |  CAST(rank * 1000 // n AS BIGINT) AS rank_pm,
       |  (rank * 1000 // n) >= 200 AS keep
       |FROM r""".stripMargin

  private def sqlStopList(lang: String): String =
    stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ",", "]")

  val textQualitySql: String = {
    val words = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')"
    s"""SELECT doc_id, n_words, n_stopwords,
       |  CAST(n_stopwords AS DOUBLE)/CAST(n_words AS DOUBLE) AS stopword_ratio,
       |  CAST(n_punct AS DOUBLE)/CAST(n_chars AS DOUBLE) AS punct_ratio,
       |  (CAST(n_stopwords AS DOUBLE)/CAST(n_words AS DOUBLE))*0.4
       |    + (1.0 - CAST(n_punct AS DOUBLE)/CAST(n_chars AS DOUBLE))*0.3
       |    + least(1.0, CAST(n_words AS DOUBLE)/100.0)*0.3 AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    CAST(len($words) AS BIGINT) AS n_words,
       |    CAST(len(list_filter($words, t -> list_contains(${sqlStopList("en")}, t))) AS BIGINT) AS n_stopwords,
       |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
       |    CAST(length(text) AS BIGINT) AS n_chars
       |  FROM documents)""".stripMargin
  }

  /** Stopword-count language ID with a fixed CASE-chain argmax (identical
    * tie-breaking in both engines). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions._
    val cnt = stopwords.map { case (l, _) =>
      l -> stopwordCount(col("text"), lit(l)) }.toMap
    val pred =
      when(cnt("en") >= cnt("de") && cnt("en") >= cnt("es") &&
        cnt("en") >= cnt("fr") && cnt("en") >= cnt("zh"), "en")
        .when(cnt("de") >= cnt("es") && cnt("de") >= cnt("fr") &&
          cnt("de") >= cnt("zh"), "de")
        .when(cnt("es") >= cnt("fr") && cnt("es") >= cnt("zh"), "es")
        .when(cnt("fr") >= cnt("zh"), "fr")
        .otherwise("zh")
    Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"), pred.as("pred_lang"),
      (pred === col("lang")).as("is_match"))
  }

  val langIdSql: String = {
    val words = "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')"
    def c(l: String) = s"len(list_filter($words, t -> list_contains(${sqlStopList(l)}, t)))"
    s"""SELECT doc_id, lang, pred_lang, pred_lang = lang AS is_match FROM (
       |  SELECT doc_id, lang,
       |    CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
       |         WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
       |         WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
       |         WHEN c_fr >= c_zh THEN 'fr'
       |         ELSE 'zh' END AS pred_lang
       |  FROM (
       |    SELECT doc_id, lang, ${c("en")} AS c_en, ${c("de")} AS c_de,
       |      ${c("es")} AS c_es, ${c("fr")} AS c_fr, ${c("zh")} AS c_zh
       |    FROM documents))""".stripMargin
  }

  /** Language-ID confusion matrix — the accuracy audit of [[langId]]
    * against the corpus's ground-truth lang column: per (truth,
    * predicted) pair, the count and its share of the truth class. The
    * classifier's quality is MEASURED by a gated query, not assumed.
    * Map-side classification + a tiny two-key aggregation; the per-class
    * total rides a second small agg joined back on the truth key. */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = langId(spark, sfDir)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = pairs.groupBy(col("lang").as("t_lang"))
      .agg(sum(col("n_docs")).as("n_total"))
    pairs.join(totals, col("lang") === col("t_lang"))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("class_share"))
  }

  val langIdConfusionSql: String =
    s"""WITH pred AS (${langIdSql}),
       |pairs AS (SELECT lang, pred_lang, COUNT(*) AS n_docs
       |  FROM pred GROUP BY lang, pred_lang),
       |totals AS (SELECT lang AS t_lang, CAST(SUM(n_docs) AS BIGINT) AS n_total
       |  FROM pairs GROUP BY lang)
       |SELECT lang, pred_lang, n_docs,
       |  CAST(n_docs AS DOUBLE)/CAST(n_total AS DOUBLE) AS class_share
       |FROM pairs JOIN totals ON lang = t_lang""".stripMargin

  // ------------------------------------- n-gram language identification

  /** Character trigrams retained per language profile. Cavnar–Trenkle
    * keep ~300 of all n-gram orders; 64 trigrams suffice on this corpus
    * and keep the profile a (#langs × 64)-row broadcast at any SF. */
  private val NgramProfileM = 64

  /** Character-TRIGRAM language ID — the Cavnar–Trenkle-style n-gram
    * profile classifier (the heuristic every fastText-era pipeline's
    * fallback descends from), complementing the word-list [[langId]]:
    * per-language profiles are TRAINED on the corpus's ground-truth
    * labels (top-[[NgramProfileM]] trigrams of the space-joined word
    * stream by count, hash-ascending tie-break), and every document
    * is scored by how many of its trigram OCCURRENCES hit each
    * language's profile — integer counts, argmax with a (score DESC,
    * lang ASC) total order, so both engines agree on every prediction.
    * Docs too short for a trigram predict the sentinel 'und'.
    *
    * Trigrams travel as 31-bit HASHES, not strings: the codegen'd
    * one-pass kernel replaces a per-position substring explode, and the
    * profile join + counts shuffle Longs instead of 3-char strings
    * (measured ~2× on the gated key). The same fold runs in the oracle,
    * so identity is preserved bit-for-bit; a ~n²/2³¹ in-language hash
    * merge would only fuse two profile entries identically in BOTH
    * engines.
    *
    * Scale shape: one tokenize pass lineage-cut for the two consumers
    * (profile training and scoring); profile derivation is a
    * (lang, tri) map-side-combinable count + a per-lang top-M window;
    * the profile is a fixed-size broadcast (hinted — #langs×M is
    * SF-independent); scoring is a tri-keyed join + (doc, lang) count
    * + per-doc argmax window. Accuracy is MEASURED by the companion
    * confusion gate, not assumed.
    *
    * The lineage cut sits on the NORMALIZED DOC frame (serialized, ~the
    * input text's size), never on the exploded trigram rows: one
    * trigram row per corpus CHARACTER is the largest frame the whole
    * pipeline touches (~3 GB/GB of text deserialized — a round-14 sf10
    * isolated run OOM'd a 32 GB JVM on exactly that checkpoint), and
    * re-running the codegen'd explode+hash per consumer is one cheap
    * scan of the cut. */
  def langIdNgram(spark: SparkSession, sfDir: String): DataFrame =
    // Session-memoized ([[Frames.sessionMemo]]): the per-doc prediction
    // frame (a 4-column label map, tiny next to the text it derives
    // from) is the shared input of this gate AND the confusion audit,
    // which re-ran the whole trigram train+score chain before round 9.
    Frames.sessionMemo("lang_id_ngram", spark, sfDir) {
      langIdNgramBuild(spark, sfDir).localCheckpoint()
    }

  private def langIdNgramBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = array_join(
      graft.engine.Tokenizer.tokens(lower(col("text")), LowerWordPattern), " ")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), norm.as("norm"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val tris = docs
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.GraftFunctions.charTrigramHashes(col("norm")))
          .as("tri"))
    val profile = tris.groupBy(col("lang"), col("tri"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("tri"))))
      .filter(col("rn") <= NgramProfileM)
      .select(col("lang").as("p_lang"), col("tri"))
    val scores = tris.select(col("doc_id"), col("tri"))
      .join(broadcast(profile), Seq("tri"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("score"))
    val best = scores.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("p_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("p_lang"), col("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("p_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("p_lang"), lit("und")) === col("lang")).as("is_match"))
  }

  val langIdNgramSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
       |    array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
       |      t -> t <> ''), ' ') AS norm
       |  FROM documents),
       |tri AS (SELECT doc_id, lang,
       |    ((CAST(ascii(substr(norm, CAST(i AS INTEGER), 1)) AS BIGINT) * 31
       |      + ascii(substr(norm, CAST(i AS INTEGER) + 1, 1))) * 31
       |      + ascii(substr(norm, CAST(i AS INTEGER) + 2, 1))) % 2147483647 AS tri
       |  FROM (SELECT doc_id, lang, norm,
       |      unnest(range(1, CAST(greatest(length(norm) - 1, 1) AS BIGINT))) AS i
       |    FROM d)),
       |prof AS (SELECT lang AS p_lang, tri FROM (
       |    SELECT lang, tri,
       |      row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tri) AS rn
       |    FROM tri GROUP BY lang, tri) WHERE rn <= $NgramProfileM),
       |sc AS (SELECT t.doc_id, p.p_lang, CAST(COUNT(*) AS BIGINT) AS score
       |  FROM tri t JOIN prof p USING (tri) GROUP BY 1, 2),
       |best AS (SELECT doc_id, p_lang, score FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, p_lang) AS rn FROM sc) WHERE rn = 1)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(b.p_lang, 'und') AS pred_lang,
       |  COALESCE(b.score, 0) AS score,
       |  COALESCE(b.p_lang, 'und') = d.lang AS is_match
       |FROM d LEFT JOIN best b USING (doc_id)""".stripMargin

  /** Confusion matrix of [[langIdNgram]] — same audit shape as
    * [[langIdConfusion]], so the two classifiers' measured accuracy is
    * directly comparable gate-to-gate. */
  def langIdNgramConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = langIdNgram(spark, sfDir)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = pairs.groupBy(col("lang").as("t_lang"))
      .agg(sum(col("n_docs")).as("n_total"))
    pairs.join(totals, col("lang") === col("t_lang"))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("class_share"))
  }

  val langIdNgramConfusionSql: String =
    s"""WITH pred AS ($langIdNgramSql),
       |pairs AS (SELECT lang, pred_lang, COUNT(*) AS n_docs
       |  FROM pred GROUP BY lang, pred_lang),
       |totals AS (SELECT lang AS t_lang, CAST(SUM(n_docs) AS BIGINT) AS n_total
       |  FROM pairs GROUP BY lang)
       |SELECT lang, pred_lang, n_docs,
       |  CAST(n_docs AS DOUBLE)/CAST(n_total AS DOUBLE) AS class_share
       |FROM pairs JOIN totals ON lang = t_lang""".stripMargin

  /** Document fingerprints: md5 of whitespace-normalized lowercase text
    * plus a 31-bit polynomial rolling hash (exact integer fold — the same
    * hash family the dedup layer uses; see graft.ext.Hashing). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      md5(graft.functions.GraftFunctions.normalizeWs(col("text"))).as("fp_md5"),
      Hashing.stringHash(col("text")).as("fp_roll"))

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_md5,
       |  ${Hashing.stringHashSql("text")} AS fp_roll
       |FROM documents""".stripMargin

  // ------------------------------------------------------ tf-idf terms

  /** Distinctive terms per doc: the 5 words with the highest tf/df
    * ratio — TF-IDF with the idf monotonically re-expressed as an exact
    * integer score `(tf * 1e6) div df` (the corpus-size factor N is
    * constant within a per-doc ranking, and a float log would not
    * reproduce bit-for-bit across engines; `div` floors identically on
    * the non-negative operands in both). Ties broken by word, so the
    * ranking is total.
    *
    * Shape at 100 TB: this is inverted-index scoring. tf = one grouped
    * agg on (doc, word); df = a second agg on word over tf's output
    * (already combined — one row per doc×word, NOT one per token); the
    * tf⋈df join is shuffle-keyed on word (the df side is
    * vocabulary-sized — sublinear but unbounded, so broadcasting it
    * would be the `% k`-sample mistake; co-partitioned hash join is the
    * scale-stable plan). Top-5 per doc is a bounded rank filter —
    * TopKPerKeyExec's territory, never a global sort.
    *
    * tf comes out of the fused [[graft.functions.HashKernels.wordTfPairs]]
    * kernel — one codegen'd pass per document, zero shuffle — instead of
    * explode + groupBy(doc, word), which exchanged one row per corpus
    * (doc, word) pair. tf fans out to TWO consumers (df and the score
    * join), and deliberately WITHOUT a lineage cut: rescanning parquet
    * and re-running the codegen kernel is cheaper than materializing
    * the corpus-sized (doc, word, tf) frame (round 6 cut a
    * shuffle-producing tf; this tf has no shuffle to save, and the df
    * branch prunes to the word column at the scan). df
    * (vocabulary-sized) is broadcast back, and the per-doc top-5 runs
    * as the bounded `graft_top_k_smallest` aggregate, whose map-side
    * partial state is a 5-element heap per doc — the exchange carries
    * five rows per document where the old rank-window shape exchanged
    * every scored (doc, word) row. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    val wtf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordTfPairs(col("text")))
          .as("p"))
      .select(col("doc_id"), col("p.word").as("word"), col("p.tf").as("tf"))
    val df = wtf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    wtf.join(broadcast(df), Seq("word"))
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions.topKSmallest(
        struct((-col("score")).as("ns"), col("word"), col("tf"), col("df"),
          col("score")), 5).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("doc_id"), (col("i") + 1).as("rnk"), col("s.word"),
        col("s.tf"), col("s.df"), col("s.score"))
  }

  val tfidfTopTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, word, tf.tf, df.df, (tf.tf * 1000000) // df.df AS score
      |  FROM tf JOIN df USING (word))
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, word,
      |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |  CAST(score AS BIGINT) AS score
      |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY score DESC, word) AS rnk
      |      FROM scored)
      |WHERE rnk <= 5""".stripMargin

  // ------------------------------------------- unigram LM surprisal

  /** Integer-exact unigram language-model surprisal per document — the
    * rare-word-density quality signal (a doc of corpus-typical words
    * scores low; a doc dense in rare tokens scores high; the CCNet /
    * Gopher stacks use an LM perplexity filter for the same decision).
    * A float `-Σ log p(w)` would hang cross-engine equality on libm's
    * uncorrectly-rounded `ln`, so the score is BIT surprisal under the
    * floor-log2 measure already used by the length histogram:
    * `bits(w) = floor_log2(total) - floor_log2(cnt(w))` via the exact
    * `length(bin(x)) - 1` identity — both engines print the same binary
    * string, no float path at all. Per doc: Σ bits and the integer
    * per-word mean in millibits.
    *
    * Scale shape: one tokenize pass lineage-cut for its two consumers
    * (the count table and the per-doc join); the count table is a
    * map-side-combinable wordcount; `total` is a 1-row broadcast; the
    * word-keyed join and doc-keyed rollup are ordinary exchanges. */
  def lmSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val words = Tokenize.wordsOf(docs).localCheckpoint()
    val cnt = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total"))
    val bits = cnt.crossJoin(broadcast(total))
      .select(col("word"),
        ((length(bin(col("total"))) - length(bin(col("cnt"))))
          .cast("long")).as("bits"))
    val perDoc = words.join(bits, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("bits")).as("surprisal_bits"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        when(col("n_words").isNull || col("n_words") === 0, 0L)
          .otherwise(expr("surprisal_bits * 1000L div n_words"))
          .as("mean_millibits"))
  }

  val lmSurprisalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
      |  FROM documents),
      |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM wc),
      |bits AS (SELECT word,
      |    CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT) AS bits
      |  FROM wc, tot),
      |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |    CAST(SUM(bits) AS BIGINT) AS surprisal_bits
      |  FROM tok JOIN bits USING (word) GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(n_words, 0) AS n_words,
      |  COALESCE(surprisal_bits, 0) AS surprisal_bits,
      |  CASE WHEN COALESCE(n_words, 0) = 0 THEN 0
      |       ELSE (surprisal_bits * 1000) // n_words END AS mean_millibits
      |FROM documents d LEFT JOIN perdoc USING (doc_id)""".stripMargin

  // ------------------------------------------- bigram LM surprisal

  /** Integer-exact CONDITIONAL bigram surprisal per document — the next
    * model up from [[lmSurprisal]]'s unigram: a word is surprising given
    * its predecessor, not in isolation, so word-salad documents (plausible
    * words, implausible transitions) finally score high. This is the
    * shape of the CCNet/Gopher perplexity filter with the LM replaced by
    * a corpus-trained bigram model.
    *
    * `bits(w2|w1) = floor_log2(cnt(w1,*)) - floor_log2(cnt(w1,w2))`
    * under the same exact `length(bin(x))` measure as the unigram —
    * the conditioning denominator is the bigram-occurrence count of the
    * prefix word, so the conditional distribution normalizes over
    * observed transitions and bits >= 0 always. No float path.
    *
    * Scale shape: one tokenize pass; the bigram frame is lineage-cut for
    * its two consumers (the transition-count table and the per-doc
    * join); transition counts are a map-side-combinable groupBy; prefix
    * counts are a second small rollup OF THE COUNT TABLE (vocabulary-
    * sized, never corpus-sized); the bigram-keyed join and doc rollup
    * are ordinary exchanges. Docs with < 2 words surface with zeros via
    * the LEFT join (the short-doc lesson). */
  def lmBigramSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val bg = docs
      .select(col("doc_id"),
        graft.engine.Tokenizer.tokens(lower(col("text")), LowerWordPattern)
          .as("ws"))
      .select(col("doc_id"), explode(expr(
        """if(size(ws) >= 2,
          |  transform(sequence(1, size(ws) - 1),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))),
          |  cast(array() as array<string>))""".stripMargin)).as("bg"))
      .localCheckpoint()
    val cnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val pre = cnt.groupBy(expr("split(bg, ' ')[0]").as("w1"))
      .agg(sum(col("cnt")).as("pcnt"))
    val bits = cnt.join(pre, expr("split(bg, ' ')[0]") === col("w1"))
      .select(col("bg"),
        (length(bin(col("pcnt"))) - length(bin(col("cnt"))))
          .cast("long").as("bits"))
    val perDoc = bg.join(bits, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("surprisal_bits"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        when(col("n_bigrams").isNull || col("n_bigrams") === 0, 0L)
          .otherwise(expr("surprisal_bits * 1000L div n_bigrams"))
          .as("mean_millibits"))
  }

  val lmBigramSurprisalSql: String =
    """WITH wsx AS (
      |  SELECT doc_id, list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '') AS ws
      |  FROM documents),
      |bgx AS (SELECT doc_id, unnest(CASE WHEN length(ws) >= 2
      |    THEN list_transform(range(1, length(ws)),
      |      i -> ws[i] || ' ' || ws[i+1])
      |    ELSE [] END) AS bg
      |  FROM wsx),
      |bc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgx GROUP BY 1),
      |pc AS (SELECT split_part(bg, ' ', 1) AS w1,
      |    CAST(SUM(cnt) AS BIGINT) AS pcnt
      |  FROM bc GROUP BY 1),
      |bits AS (SELECT bg,
      |    CAST(length(bin(pcnt)) - length(bin(cnt)) AS BIGINT) AS bits
      |  FROM bc JOIN pc ON split_part(bc.bg, ' ', 1) = pc.w1),
      |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(bits) AS BIGINT) AS surprisal_bits
      |  FROM bgx JOIN bits USING (bg) GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(n_bigrams, 0) AS n_bigrams,
      |  COALESCE(surprisal_bits, 0) AS surprisal_bits,
      |  CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
      |       ELSE (surprisal_bits * 1000) // n_bigrams END AS mean_millibits
      |FROM documents d LEFT JOIN perdoc USING (doc_id)""".stripMargin

  // ------------------------------------------------------ BM25 retrieval

  /** Query terms per retrieval run and results per term. */
  private val Bm25QueryTerms = 4
  private val Bm25TopK = 10

  /** BM25 top-k retrieval — the missing READ side of a curation stack
    * (keyword search over the corpus: decontamination probes, targeted
    * quality audits, eval-set mining all start with "find the documents
    * matching these terms"). Okapi BM25 with k1 = 1.2, b = 0.75,
    * carried out entirely in Long arithmetic so ranking is engine- and
    * partitioning-exact:
    *
    *  - idf: the Robertson idf argument (N−df+0.5)/(df+0.5)+1 equals
    *    the exact rational (2N+1)/(2df+1), so idf_bits =
    *    floor_log2((2N+1) div (2df+1)) via the `length(bin(x))−1`
    *    identity — the floor-log2 measure every other scoring key here
    *    uses (no libm ln anywhere).
    *  - tf saturation: tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    *    avgdl kept as the exact fraction S/N (S = corpus words): clear
    *    denominators by 10·S and the permille part becomes
    *    (1000·22·tf·S) div (10·S·tf + 3·S + 9·dl·N) — pure integer.
    *    (Long-safe to S ≈ 4e14 corpus words at tf ≤ 400; DECIMAL(38)
    *    beyond, same caveat family as the gram matrix.)
    *  - score = idf_bits · tf_permille; ties break on doc_id, so top-k
    *    is a total order.
    *
    * The query set is data-derived and constant-size: the
    * [[Bm25QueryTerms]] rarest corpus terms by (df asc, word asc) —
    * rarest-first makes the gate exercise nontrivial idf levels (this
    * corpus's planted rare term scores 4 bits, the rest 0–1).
    *
    * Scale shape: term selection is a TakeOrdered over the df table
    * (constant result, broadcast); the posting join filters the
    * (doc, word) tf table to query terms BEFORE anything widens — at
    * 100 TB the exchanges carry only docs containing a query term;
    * tf and dl come out of the fused wordTfPairs kernel row-locally
    * (zero shuffle — see bm25Hits); top-k per term is a window over
    * [[Bm25QueryTerms]] partitions of candidate hits, the standard
    * distributed top-k. */
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bm25Hits(spark, sfDir)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= Bm25TopK)
      .select(col("term"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("tf"), col("dl"), col("df"), col("idf_bits"),
        col("tf_permille"), col("score"))
  }

  /** The scored candidate set behind [[bm25TopK]] — every (query term,
    * matching doc) with its exact-integer statistics, BEFORE the top-k
    * cut. The seam [[searchRrf]] fuses other rankers over. */
  private def bm25Hits(spark: SparkSession, sfDir: String): DataFrame = {
    // Per-doc (word, tf) pairs from the fused wordTfPairs kernel, with
    // dl = Σtf computed ROW-LOCALLY on the same kernel array — the old
    // shape exchanged one row per corpus (doc, word) for tf, exchanged
    // again for the dl table, and joined dl back onto the hits; all
    // three of those corpus-sized movements are gone. Docs with zero
    // tokens never enter tf/dl in either shape. No lineage cuts: every
    // reread is a scan + codegen kernel pass, cheaper than
    // materializing a corpus-sized frame.
    val pairs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.wordTfPairs(col("text")).as("wtf"))
      .filter(size(col("wtf")) > 0)
      .withColumn("dl",
        expr("aggregate(wtf, CAST(0 AS BIGINT), (acc, p) -> acc + p.tf)"))
    val tf = pairs
      .select(col("doc_id"), col("dl"), explode(col("wtf")).as("p"))
      .select(col("doc_id"), col("p.word").as("word"), col("p.tf").as("tf"),
        col("dl"))
    val totals = pairs.agg(sum(col("dl")).as("s"), count(lit(1)).as("n"))
    val dfTab = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val terms = dfTab
      .orderBy(col("df"), col("word")).limit(Bm25QueryTerms)
      .crossJoin(broadcast(totals))
      .select(col("word").as("term"), col("df"),
        (length(bin(expr("(2*n + 1) div (2*df + 1)"))) - 1)
          .cast("long").as("idf_bits"),
        col("s"), col("n"))
    tf.join(broadcast(terms), tf("word") === terms("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("idf_bits"),
        expr("(1000 * 22 * tf * s) div (10 * s * tf + 3 * s + 9 * dl * n)")
          .as("tf_permille"))
      .withColumn("score", col("idf_bits") * col("tf_permille"))
  }

  /** The shared CTE chain ending in `hits` — the SQL twin of
    * [[bm25Hits]], prefix of both search oracles. */
  private val bm25HitsCtes: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
       |  FROM documents),
       |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n FROM dl),
       |dfx AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |terms AS (SELECT word AS term, df,
       |    CAST(length(bin((2*n + 1) // (2*df + 1))) - 1 AS BIGINT) AS idf_bits,
       |    s, n
       |  FROM dfx, tot ORDER BY df, word LIMIT $Bm25QueryTerms),
       |hits AS (SELECT term, tf.doc_id, tf.tf, dl.dl, terms.df, idf_bits,
       |    (1000 * 22 * tf.tf * s) //
       |      (10 * s * tf.tf + 3 * s + 9 * dl.dl * n) AS tf_permille
       |  FROM tf JOIN terms ON tf.word = terms.term
       |  JOIN dl ON tf.doc_id = dl.doc_id)""".stripMargin

  val bm25TopKSql: String =
    s"""WITH $bm25HitsCtes
       |SELECT term, CAST(rnk AS BIGINT) AS rnk, doc_id, tf, dl, df, idf_bits,
       |  tf_permille, idf_bits * tf_permille AS score
       |FROM (SELECT *, row_number() OVER (PARTITION BY term
       |        ORDER BY idf_bits * tf_permille DESC, doc_id) AS rnk
       |      FROM hits)
       |WHERE rnk <= $Bm25TopK""".stripMargin

  private val PrfSeedDocs = 3
  private val PrfExpTerms = 5

  /** Pseudo-relevance-feedback query expansion (Rocchio 1971 lineage;
    * the PRF step every classic IR stack runs between first-pass
    * retrieval and rerank): for each BM25 query term, take its top-
    * [[PrfSeedDocs]] documents as assumed-relevant feedback, pool
    * their vocabulary, and rank candidate expansion terms by
    * (feedback-doc frequency DESC, corpus df ASC, word ASC) — common
    * in the feedback pool, rare in the corpus: the integer-exact
    * rendering of the Rocchio signal with no tf-idf float anywhere.
    * Emits the top-[[PrfExpTerms]] expansions per seed term.
    *
    * Scale shape: seed docs come from the shared [[bm25Hits]] stage
    * (pruned posting lists, one term-keyed exchange) via a bounded
    * window; the feedback pool join is keyed on doc_id against a
    * BROADCAST seed frame (≤ terms·seeds rows at any SF); candidate
    * ranking is a map-side-combinable count + a window over
    * [[Bm25QueryTerms]] partitions; the df attach is one keyed join. */
  def searchPrfExpansion(spark: SparkSession, sfDir: String): DataFrame = {
    val seeds = bm25Hits(spark, sfDir)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= PrfSeedDocs)
      .select(col("term"), col("doc_id"))
    // Fused-kernel tf (see bm25Hits): zero-shuffle, rereads beat a
    // corpus-sized checkpoint for the two consumers.
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordTfPairs(col("text")))
          .as("p"))
      .select(col("doc_id"), col("p.word").as("word"), col("p.tf").as("tf"))
    val dfTab = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val pool = tf.join(broadcast(seeds), Seq("doc_id"))
      .filter(col("word") =!= col("term"))
      .groupBy(col("term"), col("word"))
      .agg(countDistinct(col("doc_id")).as("fb_docs"))
    pool.join(dfTab, Seq("word"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("fb_docs").desc, col("df").asc, col("word").asc))
        .cast("long"))
      .filter(col("rank") <= PrfExpTerms)
      .select(col("term"), col("word").as("exp_word"), col("fb_docs"),
        col("df"), col("rank"))
  }

  val searchPrfExpansionSql: String =
    s"""WITH $bm25HitsCtes,
       |seeds AS (SELECT term, doc_id FROM (
       |    SELECT term, doc_id, row_number() OVER (PARTITION BY term
       |      ORDER BY idf_bits * tf_permille DESC, doc_id) AS rnk
       |    FROM hits)
       |  WHERE rnk <= $PrfSeedDocs),
       |pool AS (SELECT s.term, tf.word,
       |    CAST(COUNT(DISTINCT tf.doc_id) AS BIGINT) AS fb_docs
       |  FROM tf JOIN seeds s ON tf.doc_id = s.doc_id
       |  WHERE tf.word <> s.term
       |  GROUP BY 1, 2)
       |SELECT term, word AS exp_word, fb_docs, df, CAST(rank AS BIGINT)
       |  AS rank
       |FROM (SELECT p.term, p.word, p.fb_docs, d.df,
       |    row_number() OVER (PARTITION BY p.term
       |      ORDER BY p.fb_docs DESC, d.df ASC, p.word ASC) AS rank
       |  FROM pool p JOIN dfx d ON p.word = d.word)
       |WHERE rank <= $PrfExpTerms""".stripMargin

  /** Held-out bigram-LM scoring — the CCNet/Gopher perplexity-filter
    * shape done honestly: the LM trains on HALF the corpus (idHash-even
    * docs — the deterministic split both engines share) and scores the
    * OTHER half, so the score measures generalization, not
    * memorization (the full-corpus [[lmBigramSurprisal]] gives every
    * seen bigram its own training mass; a held-out eval is what a real
    * quality filter runs). Unseen mass gets Stupid Backoff (Brants
    * 2007 — THE web-scale LM smoothing: no discounting, a fixed
    * backoff penalty, because at corpus scale proper Kneser-Ney
    * renormalization isn't worth the extra passes), floor-log2
    * integer-rendered so both engines agree bit-for-bit:
    *
    *  - seen bigram:      bits = len(bin(pcnt)) − len(bin(cnt))
    *  - unseen, seen w2:  bits = 2 + len(bin(T)) − len(bin(ucnt(w2)))
    *    (backoff to the unigram, α = 1/4 ⇒ +2 bits)
    *  - unseen w2 (OOV):  bits = 2 + len(bin(T))
    *
    * Output per eval doc: bigram count, OOV-bigram count (its own
    * quality signal — boilerplate has few, gibberish many), total and
    * mean surprisal.
    *
    * Scale shape: train counts are map-side-combinable aggs over the
    * even half; the eval join is keyed on the bigram string (then w2);
    * T is a 1-row broadcast. Filters on idHash parity are row-local
    * and ride the scan. */
  def lmHeldout(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    def half(parity: Int) = docs
      .filter(Hashing.idHash(col("doc_id")) % 2 === parity)
      .select(col("doc_id"),
        graft.engine.Tokenizer.tokens(lower(col("text")), LowerWordPattern)
          .as("ws"))
    def bigramsOf(ws: DataFrame): DataFrame = ws
      .select(col("doc_id"), explode(expr(
        """if(size(ws) >= 2,
          |  transform(sequence(1, size(ws) - 1),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))),
          |  cast(array() as array<string>))""".stripMargin)).as("bg"))
    val trainBg = bigramsOf(half(0)).localCheckpoint() // 3 consumers
    val bc = trainBg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val pc = bc.groupBy(expr("split(bg, ' ')[0]").as("w1"))
      .agg(sum(col("cnt")).as("pcnt"))
    val uc = trainBg // unigram continuation counts from the same pass
      .groupBy(expr("split(bg, ' ')[1]").as("w2u"))
      .agg(count(lit(1)).as("ucnt"))
    val tot = trainBg.agg(count(lit(1)).as("t"))
    val seenBits = bc.join(pc, expr("split(bg, ' ')[0]") === col("w1"))
      .select(col("bg").as("sbg"),
        (length(bin(col("pcnt"))) - length(bin(col("cnt"))))
          .cast("long").as("sbits"))
    val evalBg = bigramsOf(half(1))
    val scored = evalBg
      .join(seenBits, col("bg") === col("sbg"), "left")
      .join(uc, expr("split(bg, ' ')[1]") === col("w2u"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("sbits"),
          lit(2L) + length(bin(col("t"))).cast("long") -
            coalesce(length(bin(col("ucnt"))).cast("long"), lit(0L)))
          .as("bits"),
        col("sbits").isNull.cast("long").as("is_oov"))
    docs.filter(Hashing.idHash(col("doc_id")) % 2 === 1)
      .select(col("doc_id"))
      .join(scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("is_oov")).as("n_oov"),
          sum(col("bits")).as("surprisal_bits")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        when(col("n_bigrams").isNull || col("n_bigrams") === 0, 0L)
          .otherwise(expr("surprisal_bits * 1000L div n_bigrams"))
          .as("mean_millibits"))
  }

  val lmHeldoutSql: String = {
    val ih = Hashing.idHashSql("doc_id")
    s"""WITH wsx AS (
       |  SELECT doc_id, ($ih) % 2 AS par, list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '') AS ws
       |  FROM documents),
       |bgx AS (SELECT doc_id, par, unnest(CASE WHEN length(ws) >= 2
       |    THEN list_transform(range(1, length(ws)),
       |      i -> ws[i] || ' ' || ws[i+1])
       |    ELSE [] END) AS bg
       |  FROM wsx),
       |bc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bgx WHERE par = 0 GROUP BY 1),
       |pc AS (SELECT split_part(bg, ' ', 1) AS w1,
       |    CAST(SUM(cnt) AS BIGINT) AS pcnt FROM bc GROUP BY 1),
       |uc AS (SELECT split_part(bg, ' ', 2) AS w2u,
       |    CAST(COUNT(*) AS BIGINT) AS ucnt
       |  FROM bgx WHERE par = 0 GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM bgx WHERE par = 0),
       |sbits AS (SELECT bg AS sbg,
       |    CAST(length(bin(pcnt)) - length(bin(cnt)) AS BIGINT) AS sbits
       |  FROM bc JOIN pc ON split_part(bc.bg, ' ', 1) = pc.w1),
       |scored AS (SELECT doc_id,
       |    COALESCE(sbits, 2 + length(bin(t))
       |      - COALESCE(length(bin(ucnt)), 0)) AS bits,
       |    CASE WHEN sbits IS NULL THEN 1 ELSE 0 END AS is_oov
       |  FROM bgx
       |  LEFT JOIN sbits ON bgx.bg = sbits.sbg
       |  LEFT JOIN uc ON split_part(bgx.bg, ' ', 2) = uc.w2u
       |  CROSS JOIN tot
       |  WHERE par = 1),
       |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(is_oov) AS BIGINT) AS n_oov,
       |    CAST(SUM(bits) AS BIGINT) AS surprisal_bits
       |  FROM scored GROUP BY 1)
       |SELECT w.doc_id,
       |  COALESCE(n_bigrams, 0) AS n_bigrams,
       |  COALESCE(n_oov, 0) AS n_oov,
       |  COALESCE(surprisal_bits, 0) AS surprisal_bits,
       |  CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
       |       ELSE (surprisal_bits * 1000) // n_bigrams END AS mean_millibits
       |FROM (SELECT DISTINCT doc_id FROM wsx WHERE par = 1) w
       |LEFT JOIN perdoc USING (doc_id)""".stripMargin
  }

  /** Reciprocal-rank-fusion constant — Cormack/Clarke/Buettcher 2009's
    * k = 60, the hybrid-retrieval standard. */
  private val RrfK = 60
  private val RrfScale = 1000000L

  /** Hybrid retrieval: fuse THREE rankers over the same candidate set
    * with reciprocal-rank fusion — the standard way production search
    * combines heterogeneous scorers without calibrating their score
    * scales (only RANKS cross the fusion boundary):
    *
    *  - r_bm25: the BM25 order (score DESC) — lexical relevance;
    *  - r_tf:   raw term frequency (tf DESC) — no length normalization,
    *            diverges from BM25 exactly on long stuffed documents;
    *  - r_len:  document brevity (dl ASC) — a tf-independent concision
    *            prior.
    *
    * rrf = Σ_rankers floor(10^6 / (60 + rank)) — the 1/(k+r) weights as
    * exact integer micros, so fused scores and the final order are
    * engine- and partition-identical (ties break on doc_id throughout).
    *
    * Scale shape: all three row_numbers ride ONE term-keyed exchange
    * (the same candidate pruning as [[bm25TopK]] — posting lists are
    * filtered to the broadcast query terms before anything widens);
    * fusion is per-row arithmetic; the final top-k is the same bounded
    * window. Adding an ANN ranker later changes none of the shape —
    * one more rank column into the same sum. */
  def searchRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def byTerm(first: Column*) =
      Window.partitionBy(col("term")).orderBy(first: _*)
    val ranked = bm25Hits(spark, sfDir)
      .withColumn("r_bm25",
        row_number().over(byTerm(col("score").desc, col("doc_id"))).cast("long"))
      .withColumn("r_tf",
        row_number().over(byTerm(col("tf").desc, col("doc_id"))).cast("long"))
      .withColumn("r_len",
        row_number().over(byTerm(col("dl").asc, col("doc_id"))).cast("long"))
      .withColumn("rrf_score",
        expr(s"$RrfScale div ($RrfK + r_bm25) + $RrfScale div ($RrfK + r_tf)" +
          s" + $RrfScale div ($RrfK + r_len)"))
    ranked
      .withColumn("rnk", row_number().over(
        byTerm(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= Bm25TopK)
      .select(col("term"), col("rnk"), col("doc_id"),
        col("r_bm25"), col("r_tf"), col("r_len"), col("rrf_score"))
  }

  val searchRrfSql: String =
    s"""WITH $bm25HitsCtes,
       |ranked AS (SELECT term, doc_id,
       |    CAST(row_number() OVER (PARTITION BY term
       |      ORDER BY idf_bits * tf_permille DESC, doc_id) AS BIGINT) AS r_bm25,
       |    CAST(row_number() OVER (PARTITION BY term
       |      ORDER BY tf DESC, doc_id) AS BIGINT) AS r_tf,
       |    CAST(row_number() OVER (PARTITION BY term
       |      ORDER BY dl ASC, doc_id) AS BIGINT) AS r_len
       |  FROM hits),
       |fused AS (SELECT *,
       |    $RrfScale // ($RrfK + r_bm25) + $RrfScale // ($RrfK + r_tf)
       |      + $RrfScale // ($RrfK + r_len) AS rrf_score
       |  FROM ranked)
       |SELECT term, CAST(rnk AS BIGINT) AS rnk, doc_id, r_bm25, r_tf, r_len,
       |  rrf_score
       |FROM (SELECT *, row_number() OVER (PARTITION BY term
       |        ORDER BY rrf_score DESC, doc_id) AS rnk FROM fused)
       |WHERE rnk <= $Bm25TopK""".stripMargin

  /** Conjunctive (AND) keyword search through an inverted-index plan —
    * the retrieval shape a decontamination or audit probe runs: find
    * every document containing ALL query terms, with per-term tf. The
    * query is the corpus's two rarest terms by (df asc, word asc) —
    * constant-size and data-derived like [[bm25TopK]]'s.
    *
    * The PLAN is the point: Spark filters the (doc, word) tf table to
    * the 2-term broadcast (a semi-join that prunes the posting lists
    * before anything widens), then keeps docs whose surviving posting
    * count equals the term count — work proportional to the MATCHING
    * postings, never to the corpus. The DuckDB oracle deliberately
    * takes the opposite plan — a full scan with per-document token-list
    * containment — so the gate proves the index path and the scan path
    * name the same documents. Output is long form (doc_id, term, tf),
    * two rows per hit, no pivot. */
  def postingsAnd(spark: SparkSession, sfDir: String): DataFrame = {
    // Fused-kernel tf (see bm25Hits): zero-shuffle, rereads beat a
    // corpus-sized checkpoint for the two consumers.
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordTfPairs(col("text")))
          .as("p"))
      .select(col("doc_id"), col("p.word").as("word"), col("p.tf").as("tf"))
    val terms = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("df"), col("word")).limit(2)
      .select(col("word"))
    val hits = tf.join(broadcast(terms), Seq("word")).localCheckpoint()
    val both = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt")).filter(col("nt") === 2L)
    hits.join(both.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("word").as("term"), col("tf"))
  }

  val postingsAndSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY 1, 2),
      |dfx AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |terms AS (SELECT word FROM dfx ORDER BY df, word LIMIT 2),
      |docs_both AS (
      |  SELECT d.doc_id FROM documents d
      |  WHERE NOT EXISTS (SELECT 1 FROM terms t WHERE NOT list_contains(
      |    list_filter(regexp_split_to_array(lower(d.text), '[^a-z]+'),
      |      x -> x <> ''), t.word)))
      |SELECT tf.doc_id, tf.word AS term, tf.tf
      |FROM tf JOIN terms t ON tf.word = t.word
      |JOIN docs_both db ON tf.doc_id = db.doc_id""".stripMargin

  /** Exact phrase search via positional adjacency — the capability a
    * bag-of-words index cannot express: count ADJACENT occurrences of
    * the corpus's most frequent bigram (count desc, then lexicographic —
    * data-derived, deterministic) per document. Re-uses the bigram
    * extraction the conditional LM is gated on; the phrase is a 1-row
    * broadcast, the probe a map-side semi-join, the per-doc count a
    * doc_id-keyed agg over matching positions only. Overlapping
    * occurrences count per starting position in both engines. */
  def phraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    // Per-doc adjacent-bigram arrays, rebuilt per consumer — re-running
    // scan+tokenize is cheaper than pinning the corpus-sized bigram
    // frame (the old localCheckpoint materialized one string row per
    // corpus bigram).
    def grams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"),
        graft.engine.Tokenizer.tokens(lower(col("text")), LowerWordPattern)
          .as("ws"))
      .withColumn("grams", expr(
        """if(size(ws) >= 2,
          |  transform(sequence(1, size(ws) - 1),
          |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))),
          |  cast(array() as array<string>))""".stripMargin))
    val docs = Tables.documents(spark, sfDir)
    // explode_OUTER + null-filter, deliberately: a plain explode gets an
    // inferred `size(grams) > 0` filter that predicate pushdown rewrites
    // below the projects by SUBSTITUTING the ws alias into the lambda's
    // element_at calls — re-tokenizing the whole document once per
    // bigram element, O(len²) per doc at the scan (measured 6.5 → 137 s
    // at sf10). The outer generate infers nothing; the null filter on
    // the OUTPUT column cannot be pushed below its own generate.
    val top = grams(docs)
      .select(explode_outer(col("grams")).as("bg"))
      .filter(col("bg").isNotNull)
      .groupBy(col("bg")).agg(count(lit(1)).as("total"))
      .orderBy(col("total").desc, col("bg")).limit(1)
      .select(col("bg"))
    // The probe is ROW-LOCAL: count the broadcast phrase's occurrences
    // inside each doc's own bigram array — no probe-side explode, no
    // (doc, phrase) re-grouping exchange.
    grams(docs).crossJoin(broadcast(top))
      .withColumn("n_hits",
        size(expr("filter(grams, g -> g = bg)")).cast("long"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("bg").as("phrase"), col("n_hits"))
  }

  val phraseSearchSql: String =
    """WITH t AS (SELECT doc_id, list_filter(
      |    regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '') AS ws
      |  FROM documents),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)),
      |      i -> ws[i] || ' ' || ws[i+1])) AS bg
      |  FROM t WHERE len(ws) >= 2),
      |top AS (SELECT bg FROM (SELECT bg, COUNT(*) AS total FROM bg GROUP BY 1)
      |  ORDER BY total DESC, bg LIMIT 1)
      |SELECT b.doc_id, b.bg AS phrase, CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM bg b JOIN top USING (bg) GROUP BY 1, 2""".stripMargin

  /** Positional window in words for [[proximitySearch]]. */
  private val ProxWindow = 8

  /** Proximity search — the retrieval predicate BETWEEN bag-of-words AND
    * exact phrase: both query terms within [[ProxWindow]] words of each
    * other, any order (NEAR/k in classical IR engines; phrase is the
    * k=1, ordered special case). Query = the same 2 rarest corpus terms
    * the conjunctive gate probes (df asc, word asc — data-derived,
    * deterministic), so the three search gates form a strictness ladder
    * over one query: AND ⊇ NEAR/8 ⊇ phrase.
    *
    * Scale shape: the df ranking rides the fused wordTfPairs kernel
    * (one entry per distinct (doc, word) — a plain COUNT per word IS
    * the document frequency, no 150M-row countDistinct expansion); the
    * position pairing is ROW-LOCAL — each doc extracts both terms'
    * positions from its own token array against the 1-row broadcast
    * query and pairs them in place (bounded by tf₁·tf₂ of the RAREST
    * terms — rare by construction; a frequent-term NEAR would ride the
    * phrase gate's adjacency encoding instead). No positional-posting
    * explode, no per-doc pairing join, no re-grouping exchange: the
    * only exchange left is the vocabulary-sized df agg. Per doc: pair
    * count within the window and the exact minimum distance. */
  def proximitySearch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val terms = docs
      .select(explode(graft.functions.GraftFunctions.wordTfPairs(col("text")))
        .as("p"))
      .select(col("p.word").as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("df"), col("word")).limit(2)
      .withColumn("tid", row_number().over(
        Window.orderBy(col("df"), col("word"))))
    val query = terms.agg(
      max(when(col("tid") === 1, col("word"))).as("term_a"),
      max(when(col("tid") === 2, col("word"))).as("term_b"))
    docs
      .select(col("doc_id"),
        graft.engine.Tokenizer.tokens(lower(col("text")), LowerWordPattern)
          .as("ws"))
      .crossJoin(broadcast(query))
      .withColumn("pa", expr(
        "filter(transform(ws, (w, i) -> IF(w = term_a, i, -1)), x -> x >= 0)"))
      .withColumn("pb", expr(
        "filter(transform(ws, (w, i) -> IF(w = term_b, i, -1)), x -> x >= 0)"))
      .filter(size(col("pa")) > 0 && size(col("pb")) > 0)
      .withColumn("within", expr(
        s"filter(flatten(transform(pa, x -> transform(pb, y -> abs(x - y))))," +
          s" d -> d <= $ProxWindow)"))
      .filter(size(col("within")) > 0)
      .select(col("doc_id"), col("term_a"), col("term_b"),
        size(col("within")).cast("long").as("n_pairs"),
        expr("array_min(within)").cast("long").as("min_dist"))
  }

  val proximitySearchSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word,
       |    unnest(range(0, len(list_filter(
       |      regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')))) AS pos
       |  FROM documents),
       |dfx AS (SELECT word, COUNT(DISTINCT doc_id) AS df
       |  FROM tok GROUP BY 1),
       |terms AS (SELECT word, row_number() OVER (ORDER BY df, word) AS tid
       |  FROM dfx ORDER BY df, word LIMIT 2),
       |a AS (SELECT doc_id, t.word AS term_a, pos AS pa
       |  FROM tok JOIN terms t ON tok.word = t.word WHERE t.tid = 1),
       |b AS (SELECT doc_id, t.word AS term_b, pos AS pb
       |  FROM tok JOIN terms t ON tok.word = t.word WHERE t.tid = 2)
       |SELECT a.doc_id, term_a, term_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(MIN(abs(pa - pb)) AS BIGINT) AS min_dist
       |FROM a JOIN b ON a.doc_id = b.doc_id
       |WHERE abs(pa - pb) <= $ProxWindow
       |GROUP BY a.doc_id, term_a, term_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (textStats _),
    "text_quality" -> (textQuality _),
    "quality_percentile_rank" -> (qualityPercentile _),
    "lang_id" -> (langId _),
    "lang_id_confusion" -> (langIdConfusion _),
    "lang_id_ngram" -> (langIdNgram _),
    "lang_id_ngram_confusion" -> (langIdNgramConfusion _),
    "doc_fingerprint" -> (fingerprint _),
    "quality_lm_surprisal" -> (lmSurprisal _),
    "quality_lm_bigram" -> (lmBigramSurprisal _),
    "quality_lm_heldout" -> (lmHeldout _),
    "tfidf_top_terms" -> (tfidfTopTerms _),
    "search_bm25" -> (bm25TopK _),
    "search_prf_expansion" -> (searchPrfExpansion _),
    "search_rrf" -> (searchRrf _),
    "search_postings_and" -> (postingsAnd _),
    "search_phrase" -> (phraseSearch _),
    "search_proximity" -> (proximitySearch _))

  val oracles: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_quality" -> textQualitySql,
    "quality_percentile_rank" -> qualityPercentileSql,
    "lang_id" -> langIdSql,
    "lang_id_confusion" -> langIdConfusionSql,
    "lang_id_ngram" -> langIdNgramSql,
    "lang_id_ngram_confusion" -> langIdNgramConfusionSql,
    "doc_fingerprint" -> fingerprintSql,
    "quality_lm_surprisal" -> lmSurprisalSql,
    "quality_lm_bigram" -> lmBigramSurprisalSql,
    "quality_lm_heldout" -> lmHeldoutSql,
    "tfidf_top_terms" -> tfidfTopTermsSql,
    "search_bm25" -> bm25TopKSql,
    "search_prf_expansion" -> searchPrfExpansionSql,
    "search_rrf" -> searchRrfSql,
    "search_postings_and" -> postingsAndSql,
    "search_phrase" -> phraseSearchSql,
    "search_proximity" -> proximitySearchSql)
}
