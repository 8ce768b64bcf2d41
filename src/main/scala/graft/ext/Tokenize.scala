package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions => GF}

/** Exact token-unit accounting — the stage that turns every char/word
  * proxy budget in the pipeline into REAL tokenizer tokens, the unit an
  * LLM training run actually buys. A fixed-vocabulary greedy
  * longest-match (wordpiece-style) subword tokenizer:
  *
  *  - vocab = the [[VocabK]] most frequent corpus words (count DESC,
  *    word ASC — an exact, reproducible tie-break; K is sized BELOW the
  *    corpus vocabulary so out-of-vocab words exist at every SF and the
  *    gate is non-vacuous);
  *  - within each word, greedy longest-match: consume the longest vocab
  *    piece at the cursor, else one char (byte fallback — coverage is
  *    total by construction, exactly the public WordPiece/BPE-inference
  *    behavior at word granularity);
  *  - token count per doc = Σ pieces over its words.
  *
  * The tokenizer is a PURE function of (word, vocab), so the corpus is
  * never tokenized row-by-row: distinct words are tokenized once
  * against the broadcast 1-row vocab frame ("tokenize the vocabulary,
  * not the corpus" — the trick every production tokenizer-counting job
  * uses) and joined back by word. Scale shape: one corpus scan +
  * word-keyed exchanges; the greedy kernel runs |distinct words| times,
  * not |corpus words| times; the vocab broadcast is K entries at any SF.
  *
  * The DuckDB oracle replays greedy matching EXACTLY with a recursive
  * CTE over the same distinct-word table (one step per consumed piece,
  * longest match via a correlated MAX over the vocab CTE), so both
  * engines must agree on every piece decision, not just on totals.
  *
  * [[corpusPackTokens]] then re-runs the doc-atomic next-fit packer
  * ([[Packing.packAtomicOf]]) with these exact token counts as the
  * budget unit — closing the VERDICT r7 gap: packing budgets were
  * char-level proxies, now they are tokens.
  */
object Tokenize {

  /** Vocab size. The synthetic corpus has a 31-word vocabulary at every
    * SF, so K=24 leaves ~7 word types out-of-vocab (gate non-vacuous:
    * fallback fires on ~20% of occurrences) and puts a frequency TIE at
    * the K boundary at sf0.01 ("group" vs "part", both 878 — the
    * deterministic tie-break is itself gated). Production would use
    * 32k–128k; K only scales the broadcast and the kernel's inner loop. */
  val VocabK = 24

  /** (doc_id, word) — one row per word occurrence. */
  private def wordsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.engine.Tokenizer.tokens(lower(col("text")),
        TextAnalysis.LowerWordPattern)).as("word"))

  /** 1-row frame: the sorted top-K vocab as an array<string> column —
    * the constant-size broadcast every tokenization joins against. */
  private[graft] def vocabRowOf(words: DataFrame, k: Int): DataFrame =
    words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(k)
      .agg(sort_array(collect_list(col("word"))).as("vocab"))

  /** (word, n_pieces, n_vocab_pieces) over the DISTINCT words of the
    * corpus — the tokenized vocabulary. */
  private def pieceTable(words: DataFrame, vocabRow: DataFrame): DataFrame =
    words.select(col("word")).distinct()
      .crossJoin(broadcast(vocabRow))
      .select(col("word"), GF.greedyPieces(col("word"), col("vocab")).as("pc"))
      .select(col("word"),
        element_at(col("pc"), 1).as("n_pieces"),
        element_at(col("pc"), 2).as("n_vocab_pieces"))

  /** Per-doc exact token accounting over an explicit (doc_id, text)
    * frame with an explicit vocab row — TokenizeSpec's seam. Drives from
    * the documents frame with LEFT joins so 0-word docs surface with
    * zeroed counts (the Quality short-doc lesson, applied from day 1). */
  private[graft] def tokenStatsOf(docs: DataFrame,
      vocabRow: DataFrame): DataFrame = {
    GF.register(docs.sparkSession)
    // words feeds the distinct-word table AND the per-doc rollup —
    // lineage-cut so the scan + tokenize runs once (q15/tfidf lesson).
    val words = wordsOf(docs).localCheckpoint()
    val perDoc = words.join(pieceTable(words, vocabRow), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        sum(col("n_vocab_pieces")).as("n_vocab_tokens"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_vocab_tokens"), lit(0L)).as("n_vocab_tokens"))
  }

  /** Gated: per-doc exact token counts under the corpus-derived vocab. */
  def corpusTokenize(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // The vocab derivation re-tokenizes (its own words frame) — one
    // extra scan over the corpus, but the vocab row must be computable
    // WITHOUT the checkpointed stats words frame so callers can also
    // supply a fixed external vocab (the production deployment shape:
    // vocab frozen once, reused across ingests).
    tokenStatsOf(docs, vocabRowOf(wordsOf(docs), VocabK))
  }

  /** Shared oracle CTEs: words → counts → vocab → distinct words →
    * recursive greedy tokenization → per-word pieces → per-doc rollup.
    * Must be spliced into a `WITH RECURSIVE` clause. */
  private[graft] val tokCtes: String = {
    val words =
      "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')"
    s"""tw AS (SELECT doc_id, unnest($words) AS word FROM documents),
       |wcnt AS (SELECT word, COUNT(*) AS c FROM tw GROUP BY word),
       |vocab AS (SELECT word AS piece FROM wcnt ORDER BY c DESC, word LIMIT $VocabK),
       |dw AS (SELECT DISTINCT word FROM tw),
       |tok AS (
       |  SELECT word, CAST(1 AS BIGINT) AS p, CAST(0 AS BIGINT) AS n,
       |    CAST(0 AS BIGINT) AS nv
       |  FROM dw
       |  UNION ALL
       |  SELECT word,
       |    p + COALESCE((SELECT MAX(length(piece)) FROM vocab v
       |      WHERE v.piece = substr(tok.word, CAST(p AS INTEGER), length(v.piece))), 1),
       |    n + 1,
       |    nv + CASE WHEN EXISTS (SELECT 1 FROM vocab v
       |      WHERE v.piece = substr(tok.word, CAST(p AS INTEGER), length(v.piece)))
       |      THEN 1 ELSE 0 END
       |  FROM tok WHERE p <= length(word)),
       |pieces AS (SELECT word, MAX(n) AS n_pieces, MAX(nv) AS n_vocab_pieces
       |  FROM tok GROUP BY word),
       |perdoc AS (SELECT tw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(p2.n_pieces) AS BIGINT) AS n_tokens,
       |    CAST(SUM(p2.n_vocab_pieces) AS BIGINT) AS n_vocab_tokens
       |  FROM tw JOIN pieces p2 USING (word) GROUP BY tw.doc_id)""".stripMargin
  }

  val corpusTokenizeSql: String =
    s"""WITH RECURSIVE $tokCtes
       |SELECT d.doc_id,
       |  COALESCE(n_words, 0) AS n_words,
       |  COALESCE(n_tokens, 0) AS n_tokens,
       |  COALESCE(n_vocab_tokens, 0) AS n_vocab_tokens
       |FROM documents d LEFT JOIN perdoc USING (doc_id)""".stripMargin

  /** Gated: the doc-atomic next-fit packer budgeted in EXACT tokens —
    * same packer, same segments, real unit. */
  def corpusPackTokens(spark: SparkSession, sfDir: String): DataFrame =
    Packing.packAtomicOf(
      corpusTokenize(spark, sfDir)
        .select(col("doc_id"), col("n_tokens").as("raw_tok")))

  val corpusPackTokensSql: String = {
    val d0Body =
      s"""SELECT d.doc_id,
         |    least(COALESCE(pd.n_tokens, 0), ${Packing.Budget}) AS n_tok,
         |    ${Hashing.idHashSql("d.doc_id")} AS k
         |  FROM documents d LEFT JOIN perdoc pd USING (doc_id)""".stripMargin
    s"""${Packing.packCtesFor(tokCtes + ",", d0Body)}
       |SELECT doc_id, n_tok, seg * ${Packing.PackIdStride} + pack AS pack_id,
       |  off AS pack_off
       |FROM rec""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_tokenize" -> (corpusTokenize _),
    "corpus_pack_tokens" -> (corpusPackTokens _))

  val oracles: Map[String, String] = Map(
    "corpus_tokenize" -> corpusTokenizeSql,
    "corpus_pack_tokens" -> corpusPackTokensSql)
}
