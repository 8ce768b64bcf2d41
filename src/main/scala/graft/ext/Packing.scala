package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequence packing — the standard post-curation step of an LLM training
  * pipeline: fold documents into fixed token-budget training rows.
  *
  * Two semantics, both shipped because production pipelines use both:
  *
  *  1. [[corpusPack]] — DOC-ATOMIC greedy next-fit: every document lands
  *     whole in exactly one pack (truncated to the budget if oversize),
  *     packs never exceed the budget. This is the "no document straddles
  *     a sequence boundary" mode used when attention must not cross
  *     document boundaries mid-doc.
  *  2. [[corpusPackChunked]] — CONCAT-AND-CHUNK: the token stream is
  *     packed contiguously and a document may straddle pack boundaries
  *     (GPT-style pretraining packing). Every pack is exactly full, so
  *     fill is 100% by construction.
  *
  * Scale design — the interesting part. Greedy next-fit is inherently a
  * SEQUENTIAL scan (each placement depends on the running fill), so a
  * faithful global implementation cannot be parallelized without a
  * composed-function scan whose state is piecewise in the incoming fill.
  * Instead the packer makes the sequence LOCALLY sequential: docs are
  * ordered by the order-scrambling idHash (the same deterministic
  * shuffle-order every audit sample uses) and cut into SEGMENTS whose
  * boundary density adapts to the corpus — segment = idHash div W with
  * W = P·S/N (N = corpus size), so a segment holds ~S docs at ANY corpus
  * size, from the 500-doc test table to 100 TB. Packing is sequential
  * within a segment (a ~S-element in-memory fold) and embarrassingly
  * parallel across segments: ONE shuffle on segment id, no global state,
  * no driver round-trip. The price is ≤ one partially-filled tail pack
  * per segment; [[corpusPackStats]] makes that loss a measured number
  * (fill_bp) instead of a claim. Chunked packing has no such loss and
  * needs a GLOBAL running token offset; that is a distributed prefix
  * sum, built declaratively: range-partition by the sort key, per-
  * partition sums (one tiny frame, rows = #partitions) cumulated and
  * broadcast back as partition offsets, plus a within-partition running
  * window — no single-partition window over the data, no driver collect.
  *
  * Determinism: idHash order, integer token counts, and integer division
  * only — the pack assignment is a pure function of the corpus, identical
  * at any parallelism, reproduced row-for-row by the DuckDB oracles
  * (next-fit as a per-segment recursive CTE; chunking as a window cumsum).
  */
object Packing {

  /** Token budget per pack. Real pipelines use the model context (2k/4k/
    * 8k); 512 here so the ~54-token synthetic docs yield multi-doc packs
    * AND multi-pack segments — both boundary cases exercised at test SF.
    * A dial, not a constant the semantics depend on. */
  val Budget = 512L

  /** Target docs per segment (expected; actual counts are Poisson(S)).
    * Bounds the per-task sequential fold at any corpus size. */
  val SegTarget = 32L

  /** pack_id = seg * Stride + pack-within-segment. Stride caps packs per
    * segment: a segment holds O(SegTarget) docs ≪ 100k, and
    * seg ≤ 2^31 ⇒ pack_id < 2^48 — no overflow. */
  val PackIdStride = 100000L

  // Not `private`: Dataset encoder codegen instantiates these from
  // generated classes outside this object's scope.
  case class PackIn(seg: Long, k: Long, doc_id: Long, n_tok: Long)
  case class PackOut(doc_id: Long, n_tok: Long, pack_id: Long,
      pack_off: Long)

  /** Per-doc whitespace-word cost — the original char-level proxy budget
    * ([[graft.ext.Tokenize]] supplies the exact-token alternative). */
  private def wordCosts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.engine.Tokenizer.tokens(col("text"))).cast("long")
          .as("raw_tok"))

  /** (doc_id, n_tok, k=idHash, seg) from an arbitrary (doc_id, raw_tok)
    * cost frame — shared head of both packers. n_tok is capped at the
    * budget only in atomic mode (truncation: a doc longer than the
    * sequence length can never fit whole). */
  private def withSegments(costs: DataFrame,
      capAtBudget: Boolean): DataFrame = {
    val raw = costs
      .select(col("doc_id"), col("raw_tok"),
        Hashing.idHash(col("doc_id")).as("k"))
    val nTok = if (capAtBudget) least(col("raw_tok"), lit(Budget))
               else col("raw_tok")
    // Second consumer of the cost frame (the corpus count), the same
    // multi-consumer shape as q15/tfidf — acceptable here because column
    // pruning makes the count branch a metadata-only scan (zero data
    // columns read), so there is no duplicated tokenize work to cut.
    val n = raw.agg(count(lit(1)).as("n"))
    raw.crossJoin(broadcast(n))
      .select(col("doc_id"), nTok.as("n_tok"), col("k"),
        expr(s"k div greatest(1L, ${Hashing.P * SegTarget}L div n)").as("seg"))
  }

  private def tokenized(spark: SparkSession, sfDir: String,
      capAtBudget: Boolean): DataFrame =
    withSegments(wordCosts(spark, sfDir), capAtBudget)

  /** Doc-atomic next-fit over any (doc_id, raw_tok) cost frame — the
    * packer seam [[graft.ext.Tokenize]] reuses with exact token counts. */
  private[graft] def packAtomicOf(costs: DataFrame): DataFrame = {
    val spark = costs.sparkSession
    import spark.implicits._
    withSegments(costs, capAtBudget = true)
      .select(col("seg"), col("k"), col("doc_id"), col("n_tok"))
      .as[PackIn]
      .groupByKey(_.seg)
      .flatMapGroups { (seg, it) =>
        // Segment-local sequential fold: ~SegTarget docs, O(S log S).
        val docs = it.toArray.sortBy(d => (d.k, d.doc_id))
        val out = Array.newBuilder[PackOut]
        var pack = 0L
        var fill = 0L
        docs.foreach { d =>
          if (fill + d.n_tok > Budget) { pack += 1; fill = 0L }
          out += PackOut(d.doc_id, d.n_tok, seg * PackIdStride + pack, fill)
          fill += d.n_tok
        }
        out.result().iterator
      }
      .toDF()
  }

  /** Doc-atomic greedy next-fit (see object doc): one row per document
    * with its pack and token offset inside the pack. */
  def corpusPack(spark: SparkSession, sfDir: String): DataFrame =
    packAtomicOf(wordCosts(spark, sfDir))

  /** Oracle CTE chain over an arbitrary capped cost CTE body: segment →
    * rank-within-segment → next-fit replayed one rank per recursive step
    * (all segments advance in parallel; iterations = max segment size,
    * ~SegTarget). `extraCtes` lets a caller prepend its own (possibly
    * recursive) cost-derivation CTEs; `d0Body` must yield
    * (doc_id, n_tok /* capped at Budget */, k).
    *
    * d0/w/d are `AS MATERIALIZED`: each recursive step's `JOIN d` and
    * the scalar `(SELECT w FROM w)` probes re-expand un-materialized
    * CTEs per reference in the oracle engine, so the ENTIRE cost
    * derivation (tokenize + admission chains in the train-manifest
    * case) re-executed once per next-fit rank — the graph-oracle
    * pathology Hashing.materializeCtes exists for, measured 108 s →
    * 0.9 s at sf0.01 and ORACLE-TIMEOUT(3300 s) → 39 s at sf3 on
    * corpus_train_manifest, value-identical. `rec` itself must stay
    * plain (a recursive CTE is its own working table). Oracle-side
    * only — the Spark packers never unroll (see corpusPackChunked). */
  private[graft] def packCtesFor(extraCtes: String, d0Body: String): String =
    s"""WITH RECURSIVE $extraCtes d0 AS MATERIALIZED ($d0Body),
       |w AS MATERIALIZED (SELECT greatest(1, ${Hashing.P * SegTarget} // COUNT(*)) AS w FROM d0),
       |d AS MATERIALIZED (
       |  SELECT doc_id, n_tok, k, k // (SELECT w FROM w) AS seg,
       |    row_number() OVER (PARTITION BY k // (SELECT w FROM w)
       |      ORDER BY k, doc_id) AS rn
       |  FROM d0),
       |rec AS (
       |  SELECT seg, rn, doc_id, n_tok, 0::BIGINT AS pack, 0::BIGINT AS off,
       |    n_tok AS fill
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.seg, d.rn, d.doc_id, d.n_tok,
       |    CASE WHEN r.fill + d.n_tok <= $Budget THEN r.pack ELSE r.pack + 1 END,
       |    CASE WHEN r.fill + d.n_tok <= $Budget THEN r.fill ELSE 0::BIGINT END,
       |    CASE WHEN r.fill + d.n_tok <= $Budget THEN r.fill + d.n_tok ELSE d.n_tok END
       |  FROM rec r JOIN d ON d.seg = r.seg AND d.rn = r.rn + 1)""".stripMargin

  /** Word-count cost as a d0 body (the original packers' budget). */
  private val wordD0Body: String =
    s"""SELECT doc_id,
       |    least(CAST(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z]+'),
       |      t -> t <> '')) AS BIGINT), $Budget) AS n_tok,
       |    ${Hashing.idHashSql("doc_id")} AS k
       |  FROM documents""".stripMargin

  private val packCtes: String = packCtesFor("", wordD0Body)

  val corpusPackSql: String =
    s"""$packCtes
       |SELECT doc_id, n_tok, seg * $PackIdStride + pack AS pack_id,
       |  off AS pack_off
       |FROM rec""".stripMargin

  /** Per-pack fill audit over any packed frame — shared by the word-
    * and token-budgeted packers. */
  private[graft] def packStatsOf(packed: DataFrame): DataFrame =
    packed
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("pack_id"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens * 10000L) div ${Budget}L").as("fill_bp"))

  /** Per-pack audit: doc count, token fill, and fill ratio in integer
    * basis points — the segment-tail loss of the parallel next-fit as a
    * gated NUMBER (and the no-pack-exceeds-budget invariant as data:
    * fill_bp ≤ 10000 on every row the oracle hashes). */
  def corpusPackStats(spark: SparkSession, sfDir: String): DataFrame =
    packStatsOf(corpusPack(spark, sfDir))

  val corpusPackStatsSql: String =
    s"""$packCtes
       |SELECT seg * $PackIdStride + pack AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  (CAST(SUM(n_tok) AS BIGINT) * 10000) // $Budget AS fill_bp
       |FROM rec GROUP BY 1""".stripMargin

  /** Concat-and-chunk packing: documents laid end-to-end in idHash order
    * and cut every Budget tokens; a doc spans packs pack_first..pack_last.
    * The global running offset is the distributed prefix sum described in
    * the object doc — partition offsets (a #partitions-row frame) are
    * cumulated with a window over that TINY frame and broadcast back;
    * the per-row window below partitions by spark_partition_id, so no
    * data-sized single-partition window exists anywhere in the plan.
    * The result is partition-count-invariant: offset(p) + local prefix
    * is the global (k, doc_id)-order prefix under any partitioning. */
  def corpusPackChunked(spark: SparkSession, sfDir: String): DataFrame = {
    val sorted = tokenized(spark, sfDir, capAtBudget = false)
      .repartitionByRange(col("k"), col("doc_id"))
      .sortWithinPartitions(col("k"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val partOffsets = sorted.groupBy(col("pid"))
      .agg(sum(col("n_tok")).as("psum"))
      .select(col("pid"),
        (coalesce(sum(col("psum")).over(
          Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .as("poff"))
    val localWin = Window.partitionBy(col("pid"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(partOffsets), "pid")
      .withColumn("start_off",
        col("poff") + coalesce(sum(col("n_tok")).over(localWin), lit(0L)))
      .select(col("doc_id"), col("n_tok"), col("start_off"),
        expr(s"start_off div ${Budget}L").as("pack_first"),
        expr(s"greatest(start_off, start_off + n_tok - 1) div ${Budget}L")
          .as("pack_last"))
  }

  val corpusPackChunkedSql: String =
    s"""WITH d0 AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z]+'),
       |      t -> t <> '')) AS BIGINT) AS n_tok,
       |    ${Hashing.idHashSql("doc_id")} AS k
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tok,
       |    COALESCE(SUM(n_tok) OVER (ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
       |  FROM d0)
       |SELECT doc_id, n_tok, CAST(start_off AS BIGINT) AS start_off,
       |  CAST(start_off AS BIGINT) // $Budget AS pack_first,
       |  greatest(CAST(start_off AS BIGINT),
       |    CAST(start_off AS BIGINT) + n_tok - 1) // $Budget AS pack_last
       |FROM c""".stripMargin

  // ------------------------------------------------- training-order shuffle

  /** Loader shard count for the gated shuffle. In production this is
    * sized to the cluster (thousands of shard files, >= writer
    * parallelism); the semantics are shard-count-generic. */
  private[graft] val NShards = 16L

  /** The training-order shuffle — the last step before packs hit the
    * data loader: deal packs pseudorandomly into [[NShards]] shard files
    * and fix a deterministic random order WITHIN each shard.
    *
    * The order key is idHash(pack_id): deterministic, rerun-stable, and
    * uncorrelated with pack construction order (adjacent packs hold
    * neighboring idHash(doc_id) keys, not neighboring content, and the
    * shuffle key re-scatters even that). No RNG state, no seed plumbing
    * — the property `DataFrame.sample`-style shuffling cannot give.
    *
    * Scale shape: one pack-keyed agg (the packer's own key, so it
    * co-partitions with the manifest), then a shard-keyed window. There
    * is deliberately NO global row_number: a total order would funnel
    * every pack through one reducer. A shard is exactly the unit one
    * writer task emits as one file, so the per-shard sort IS the write
    * task's work — at any corpus size, parallelism = shard count. */
  def corpusPackShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val packs = corpusPack(spark, sfDir)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("sk", Hashing.idHash(col("pack_id")))
      .withColumn("shard_id", col("sk") % NShards)
    packs
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard_id"))
          .orderBy(col("sk"), col("pack_id"))).cast("long"))
      .select(col("pack_id"), col("shard_id"), col("shard_pos"),
        col("n_docs"), col("n_tokens"))
  }

  val corpusPackShuffleSql: String =
    s"""$packCtes,
       |pk AS (SELECT seg * $PackIdStride + pack AS pack_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |  FROM rec GROUP BY 1),
       |skk AS (SELECT pack_id, n_docs, n_tokens,
       |  ${Hashing.idHashSql("pack_id")} AS sk FROM pk)
       |SELECT pack_id, sk % $NShards AS shard_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY sk % $NShards
       |    ORDER BY sk, pack_id) AS BIGINT) AS shard_pos,
       |  n_docs, n_tokens
       |FROM skk""".stripMargin

  // ------------------------------------------------------- curriculum

  /** Curriculum schedule over the packed corpus — the training-order
    * twin of [[corpusPackShuffle]]: instead of a hash shuffle, packs
    * are ordered easy → hard by their mean unigram surprisal (the
    * [[TextAnalysis.lmSurprisal]] quality signal, integer millibits),
    * the standard curriculum-learning recipe (common-word-dense packs
    * first, rare-token-dense packs last). Composes two already-gated
    * stages, so a drift in either surfaces here too.
    *
    * Scale: the per-pack rollup is a pack_id-keyed map-side-combinable
    * agg over #docs rows; the final rank is ONE global sort over
    * #packs rows (= corpus_tokens / budget — 4 orders of magnitude
    * smaller than the corpus; a distributed range sort handles it at
    * any SF). Mean is computed as floored millibits from exact Long
    * sums — no float path, total-order tiebreak on pack_id. */
  def corpusCurriculum(spark: SparkSession, sfDir: String): DataFrame = {
    val packs = corpusPack(spark, sfDir).select(col("doc_id"), col("pack_id"))
    val sup = TextAnalysis.lmSurprisal(spark, sfDir)
      .select(col("doc_id"), col("n_words"), col("surprisal_bits"))
    packs.join(sup, Seq("doc_id"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        sum(col("surprisal_bits")).as("sum_bits"))
      .withColumn("mean_millibits",
        when(col("sum_words") > 0L, expr("(sum_bits * 1000) div sum_words"))
          .otherwise(0L))
      .withColumn("curriculum_pos",
        row_number().over(
          Window.orderBy(col("mean_millibits"), col("pack_id")))
          .cast("long"))
  }

  val corpusCurriculumSql: String =
    s"""$packCtes,
       |tokc AS (SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> '')) AS word
       |  FROM documents),
       |wcc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM tokc GROUP BY 1),
       |totc AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM wcc),
       |bitsc AS (SELECT word,
       |    CAST(length(bin(total)) - length(bin(cnt)) AS BIGINT) AS bits
       |  FROM wcc, totc),
       |perdocc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(bits) AS BIGINT) AS surprisal_bits
       |  FROM tokc JOIN bitsc USING (word) GROUP BY 1),
       |pks AS (SELECT rec.doc_id, seg * $PackIdStride + pack AS pack_id,
       |    COALESCE(n_words, 0) AS n_words,
       |    COALESCE(surprisal_bits, 0) AS surprisal_bits
       |  FROM rec LEFT JOIN perdocc USING (doc_id)),
       |pagg AS (SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_words) AS BIGINT) AS sum_words,
       |    CAST(SUM(surprisal_bits) AS BIGINT) AS sum_bits
       |  FROM pks GROUP BY 1)
       |SELECT pack_id, n_docs, sum_words, sum_bits,
       |  CASE WHEN sum_words > 0 THEN (sum_bits * 1000) // sum_words
       |       ELSE 0 END AS mean_millibits,
       |  CAST(ROW_NUMBER() OVER (ORDER BY
       |    CASE WHEN sum_words > 0 THEN (sum_bits * 1000) // sum_words
       |         ELSE 0 END, pack_id) AS BIGINT) AS curriculum_pos
       |FROM pagg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pack" -> (corpusPack _),
    "corpus_pack_stats" -> (corpusPackStats _),
    "corpus_pack_chunked" -> (corpusPackChunked _),
    "corpus_pack_shuffle" -> (corpusPackShuffle _),
    "corpus_curriculum" -> (corpusCurriculum _))

  val oracles: Map[String, String] = Map(
    "corpus_pack" -> corpusPackSql,
    "corpus_pack_stats" -> corpusPackStatsSql,
    "corpus_pack_chunked" -> corpusPackChunkedSql,
    "corpus_pack_shuffle" -> corpusPackShuffleSql,
    "corpus_curriculum" -> corpusCurriculumSql)
}
