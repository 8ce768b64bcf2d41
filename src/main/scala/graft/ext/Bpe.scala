package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding vocabulary LEARNING — the tokenizer-training step
  * whose inference twin is [[Tokenize]]: starting from characters, learn
  * the first [[NumMerges]] merges by repeatedly fusing the corpus's most
  * frequent adjacent symbol pair (Sennrich et al. 2016, the public BPE
  * algorithm every modern subword tokenizer descends from).
  *
  * Determinism: pair counts are exact integers weighted by word-type
  * frequency; the winning pair each round is picked by the strict total
  * order (count DESC, left ASC, right ASC); the within-word merge is
  * left-to-right non-overlapping. Both engines execute the SAME merge
  * algebra: a word's symbol sequence is a `|`-delimited string and the
  * merge is a left fold `acc' = if (x == r && acc endsWith "|"+l) acc+x
  * else acc+"|"+x` — the `endsWith` boundary test makes the fold exactly
  * the textbook scan (a just-merged `l+r` can never re-match as `l`
  * because `r` is nonempty), and the identical fold runs as a Spark
  * `aggregate` HOF and a DuckDB `list_reduce`, so any divergence in a
  * single merge decision hash-mismatches the gate.
  *
  * Scale shape: BPE learning operates on WORD TYPES with counts, never
  * on the corpus rows — one corpus scan builds the (word, cnt) table
  * (map-side-combinable wordcount shuffle), after which every round
  * touches a vocabulary-sized frame: pair counting is an explode +
  * map-side-combinable groupBy, the winner is a 1-row broadcast, and
  * the merge is a per-row fold. [[NumMerges]] rounds are UNROLLED into
  * one lineage (the PageRank discipline, localCheckpoint per round to
  * keep analysis flat); production would raise the round count and the
  * plan shape would not change.
  */
object Bpe {

  /** Learned merge count. Production BPE learns 30k+ merges by the same
    * per-round plan; 8 keeps the unrolled gate cheap while still
    * exercising merge COMPOSITION (round 8 on this corpus fuses 'p' with
    * the round-7 merge 'ar' — a second-order piece). */
  val NumMerges = 8

  private def symsOf(seq: Column): Column =
    filter(split(seq, "\\|"), s => length(s) > lit(0))

  /** One merge-learning run over an explicit (word, cnt) word-type
    * frame — BpeSpec's seam. Returns the merge table
    * (merge_rank, left_piece, right_piece, merged, pair_count). */
  private[graft] def mergesOf(wordTypes: DataFrame): DataFrame =
    runMerges(wordTypes)._1

  /** The rounds, returning BOTH artifacts: the merge table and the
    * final per-word-type symbol state (cnt, seq) the vocabulary report
    * reads. */
  private[graft] def runMerges(wordTypes: DataFrame): (DataFrame, DataFrame) = {
    // Interpreted execution for the eager round window (round 14):
    // every frame the 8 rounds touch is vocabulary-sized and
    // single-partition, so whole-stage/expression codegen buys nothing
    // — but a cold JVM paid Janino + C2 compilation across the ~16
    // per-round jobs (isolated rep-1 26.6 s vs 8.5 s warm, the r13
    // "JIT-warmup-bound" diagnosis; at 100× every fresh executor JVM
    // pays the same). The rounds run EAGERLY (localCheckpoint) inside
    // the conf window and the restored conf governs everything after,
    // so the scope is exactly the merge loop. Values are
    // codegen-invariant (the fold was CodegenFallback already).
    val session = wordTypes.sparkSession
    val keys = Seq("spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode")
    val prev = keys.map(k => k -> session.conf.get(k))
    keys.foreach(k => session.conf.set(k,
      if (k.endsWith("factoryMode")) "NO_CODEGEN" else "false"))
    try runMergesEager(wordTypes)
    finally prev.foreach { case (k, v) => session.conf.set(k, v) }
  }

  private def runMergesEager(wordTypes: DataFrame): (DataFrame, DataFrame) = {
    // The word-type frame is vocabulary-sized (31 rows here, ~1M at a
    // 100 TB corpus) — collapse it to one partition up front so the 8
    // per-round checkpoint/fold jobs schedule 1 task instead of a full
    // shuffle-partition fan of empties (measured 2.9 s -> sub-second on
    // the gated run; at production vocab sizes a single partition of a
    // few MB is still the right shape for a per-round sequential fold).
    var cur = wordTypes
      .select(col("cnt"),
        regexp_replace(col("word"), "(.)", "|$1").as("seq"))
      .coalesce(1)
      .localCheckpoint()
    val rounds = (1 to NumMerges).map { i =>
      // Adjacent pairs weighted by word frequency; the sequence() guard
      // keeps single-symbol words from a descending-range fan-out.
      val pairs = cur
        .select(col("cnt"), symsOf(col("seq")).as("syms"))
        .select(col("cnt"),
          explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              j => struct(element_at(col("syms"), j).as("l"),
                element_at(col("syms"), j + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>")))
            .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      // Two consumers (the merge-table row and the fold's broadcast) —
      // cut so the pair count + TakeOrdered runs once per round.
      val best = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .localCheckpoint()
      val merge = best.select(
        lit(i.toLong).as("merge_rank"),
        col("l").as("left_piece"), col("r").as("right_piece"),
        concat(col("l"), col("r")).as("merged"),
        col("c").as("pair_count"))
      // LEFT join against the (0-or-1-row) winner, not a cross join: a
      // round with no remaining pairs must be a FIXED POINT (null l/r
      // make the fold's merge branch unreachable, so every seq passes
      // through unchanged) — a cross join with an empty winner would
      // silently empty the whole word-state table and zero the vocab
      // report whenever NumMerges exceeds the available pair rounds.
      cur = cur.join(broadcast(best), lit(true), "left")
        .select(col("cnt"),
          aggregate(symsOf(col("seq")), lit(""), (acc, x) =>
            when(x === col("r") &&
                endswith(acc, concat(lit("|"), col("l"))),
              concat(acc, x))
              .otherwise(concat(acc, lit("|"), x)))
            .as("seq"))
        // Eager per-round cut: without it every round's winner (and the
        // final union) re-executes ALL prior rounds' folds — measured
        // 8.7 s vs 2.6 s checkpointed (the opposite call from PageRank,
        // whose per-round frames were cheap to recompute).
        .localCheckpoint()
      merge
    }
    (rounds.reduce(_ unionAll _), cur)
  }

  private def corpusWordTypes(spark: SparkSession, sfDir: String): DataFrame =
    Tokenize.wordsOf(Tables.documents(spark, sfDir))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Session-memoized corpus learn run (round-17 optimization): the two
    * gated reports both need the 8-round merge loop's artifacts — the
    * merge table AND the final word-type states — and before this memo
    * each report re-ran the whole loop (≈16 jobs) per execution, the
    * single most expensive key pair in the sf0.1 bench (3.06 + 2.32 s).
    * The [[Basket.copurchase]] discipline applies verbatim: one bounded,
    * vocabulary-sized checkpoint per session (≤ |merges| + |word types|
    * rows — 39 here, ~1M at a 100 TB corpus), both artifacts carried in
    * one frame under a `kind` discriminator ('m' = merge-table row,
    * 's' = word-state row) because [[Frames.sessionMemo]] protects one
    * frame per tag. At a real deployment this IS the shape: BPE learning
    * runs once, every downstream report reads the learned artifacts. */
  private def bpeRun(spark: SparkSession, sfDir: String): DataFrame =
    Frames.sessionMemo("bpe_run", spark, sfDir) {
      val (merges, fin) = runMerges(corpusWordTypes(spark, sfDir))
      merges.select(lit("m").as("kind"), col("merge_rank"),
          col("left_piece"), col("right_piece"), col("merged"),
          col("pair_count"), lit(null).cast("long").as("cnt"),
          lit(null).cast("string").as("seq"))
        .unionAll(fin.select(lit("s").as("kind"),
          lit(null).cast("long").as("merge_rank"),
          lit(null).cast("string").as("left_piece"),
          lit(null).cast("string").as("right_piece"),
          lit(null).cast("string").as("merged"),
          lit(null).cast("long").as("pair_count"),
          col("cnt"), col("seq")))
        .localCheckpoint()
    }

  /** Gated: the first [[NumMerges]] BPE merges learned from the corpus. */
  def corpusBpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    bpeRun(spark, sfDir).filter(col("kind") === "m")
      .select(col("merge_rank"), col("left_piece"), col("right_piece"),
        col("merged"), col("pair_count"))

  /** Gated: the learned vocabulary IN USE after the merges — every
    * symbol surviving in the final word-type states, with its length,
    * its distinct position count across word types, and its corpus
    * token mass (positions weighted by word frequency). The report a
    * tokenizer training run is judged by: how much of the corpus's
    * token stream the learned multi-char pieces absorbed vs residual
    * single chars. Derived from the same per-round states as the merge
    * table — one explode + map-side-combinable groupBy on the final
    * vocabulary-sized frame. */
  def corpusBpeVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val fin = bpeRun(spark, sfDir).filter(col("kind") === "s")
      .select(col("cnt"), col("seq"))
    fin.select(col("cnt"), explode(symsOf(col("seq"))).as("piece"))
      .groupBy(col("piece"))
      .agg(count(lit(1)).as("n_positions"),
        sum(col("cnt")).as("token_mass"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("n_positions"), col("token_mass"))
  }

  /** Shared oracle CTE chain: word types → r0 → (p_i, b_i, r_i) per
    * unrolled round. Ends with r[[NumMerges]]. */
  private val bpeCtes: String = {
    def roundCtes(i: Int): String =
      s"""p$i AS (
         |  SELECT syms[j] AS l, syms[j+1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS j
         |        FROM (SELECT cnt, list_filter(string_split(seq, '|'), s -> s <> '') AS syms FROM r${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |r$i AS (
         |  SELECT cnt, list_reduce(
         |      list_prepend('', list_filter(string_split(seq, '|'), s -> s <> '')),
         |      (acc, x) -> CASE WHEN x = b.r AND ends_with(acc, '|' || b.l)
         |                       THEN acc || x ELSE acc || '|' || x END) AS seq
         |  FROM r${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    s"""WITH
       |w AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word FROM documents),
       |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY word),
       |r0 AS (SELECT cnt, regexp_replace(word, '(.)', '|\\1', 'g') AS seq FROM wc),
       |${(1 to NumMerges).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  val corpusBpeMergesSql: String = {
    val selects = (1 to NumMerges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS merge_rank, l AS left_piece,
         |  r AS right_piece, l || r AS merged, c AS pair_count FROM b$i""".stripMargin
    }
    s"""$bpeCtes
       |${selects.mkString("\nUNION ALL\n")}""".stripMargin
  }

  val corpusBpeVocabSql: String =
    s"""$bpeCtes
       |SELECT sym AS piece, CAST(length(sym) AS BIGINT) AS piece_len,
       |  CAST(COUNT(*) AS BIGINT) AS n_positions,
       |  CAST(SUM(cnt) AS BIGINT) AS token_mass
       |FROM (SELECT cnt,
       |    unnest(list_filter(string_split(seq, '|'), s -> s <> '')) AS sym
       |  FROM r$NumMerges)
       |GROUP BY sym""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_bpe_merges" -> (corpusBpeMerges _),
    "corpus_bpe_vocab" -> (corpusBpeVocab _))

  val oracles: Map[String, String] = Map(
    "corpus_bpe_merges" -> corpusBpeMergesSql,
    "corpus_bpe_vocab" -> corpusBpeVocabSql)
}
