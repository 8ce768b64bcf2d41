package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Overlapping-window document chunking — the retrieval/context-window
  * splitter of an LLM data pipeline (RAG indexing, long-doc truncation
  * to model context, fixed-stride pretraining windows).
  *
  * Window rule, identical on both engines in pure integer arithmetic:
  * chunks start at 0, Stride, 2·Stride, … and are `Window` chars long;
  * the LAST start is the smallest k·Stride whose window reaches the end
  * of the doc (k_max = ceil(max(len − Window, 0) / Stride)), so every
  * char is covered, consecutive chunks share exactly Window − Stride
  * chars, and no pure-suffix tail fragments are emitted. A doc shorter
  * than one window is exactly one (short) chunk.
  *
  * Scale shape: chunking is `posexplode(sequence(0, k_max))` + a
  * `substring` per chunk — entirely map-side, zero shuffles, and the
  * fan-out factor is len/Stride (bounded per row, not per corpus). The
  * gate carries a polyHash fingerprint of each chunk rather than the
  * chunk text, so the oracle proves the SUBSTRING SEMANTICS (1-based,
  * clamped) agree byte-for-byte without shipping the corpus twice.
  * ChunkingSpec pins the overlap/coverage algebra: suffix(k) ≡
  * prefix(k+1) over the overlap, and stride-prefixes concatenate back
  * to the document.
  */
object Chunking {

  /** Window / stride in chars (chars are the container-safe stand-in
    * for tokens; the rule is parameter-independent). Overlap = 30. */
  val Window = 120L
  val Stride = 90L

  /** Chunk an arbitrary (doc_id, text) frame — the reusable operator;
    * the gates below apply it to the corpus. Output keeps the chunk
    * text (callers project it away when only fingerprints are needed). */
  def chunksOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .withColumn("kmax",
        expr(s"(greatest(len - $Window, 0L) + ${Stride - 1}L) div ${Stride}L"))
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr("sequence(0L, kmax)")).as("k"))
      .withColumn("chunk",
        expr(s"substring(text, cast(k * $Stride + 1 as int), $Window)"))

  private def chunked(spark: SparkSession, sfDir: String): DataFrame =
    chunksOf(Tables.documents(spark, sfDir))

  /** One row per (doc, chunk): index, start offset, exact length, and a
    * content fingerprint of the chunk. */
  def chunkOverlap(spark: SparkSession, sfDir: String): DataFrame =
    chunked(spark, sfDir).select(
      col("doc_id"),
      col("k").as("chunk_idx"),
      (col("k") * Stride).as("chunk_start"),
      length(col("chunk")).cast("long").as("chunk_len"),
      Hashing.stringHash(col("chunk")).as("chunk_hash"))

  /** Per-doc chunking audit: chunk count, chunked char mass, and the
    * overlap overhead in basis points (how much the window/stride pair
    * inflates stored chars vs the raw doc — the storage-cost number a
    * chunking config is chosen by). */
  def chunkStats(spark: SparkSession, sfDir: String): DataFrame =
    chunkOverlap(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunked_chars"))
      .join(Tables.documents(spark, sfDir).select(col("doc_id"),
        col("n_chars")), Seq("doc_id"))
      .select(col("doc_id"), col("n_chunks"), col("chunked_chars"),
        // 0-length docs chunk to one empty chunk; their overhead is 0 by
        // convention (DuckDB's // would raise on /0 where Spark div
        // yields NULL — guard BOTH engines explicitly)
        expr("CASE WHEN n_chars = 0 THEN 0L ELSE " +
          "(chunked_chars - n_chars) * 10000 div n_chars END")
          .as("overhead_bp"))

  /** Both engines share the lateral-unnest form of the window rule; the
    * oracle re-derives every chunk from the ORIGINAL text. */
  private def chunkedSql: String =
    s"""SELECT doc_id, k,
       |  substr(text, CAST(k * $Stride + 1 AS BIGINT), $Window) AS chunk
       |FROM (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, CAST((greatest(length(text) - $Window, 0)
       |      + ${Stride - 1}) // $Stride AS BIGINT))) AS k
       |  FROM documents)""".stripMargin

  val chunkOverlapSql: String =
    s"""SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       |  CAST(k * $Stride AS BIGINT) AS chunk_start,
       |  CAST(length(chunk) AS BIGINT) AS chunk_len,
       |  ${Hashing.stringHashSql("chunk")} AS chunk_hash
       |FROM ($chunkedSql)""".stripMargin

  val chunkStatsSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, COUNT(*) AS n_chunks,
       |    CAST(SUM(length(chunk)) AS BIGINT) AS chunked_chars
       |  FROM ($chunkedSql) GROUP BY doc_id)
       |SELECT c.doc_id, c.n_chunks, c.chunked_chars,
       |  CAST(CASE WHEN d.n_chars = 0 THEN 0 ELSE
       |    (c.chunked_chars - d.n_chars) * 10000 // d.n_chars END AS BIGINT)
       |    AS overhead_bp
       |FROM c JOIN documents d USING (doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_chunk_overlap" -> (chunkOverlap _),
    "corpus_chunk_stats" -> (chunkStats _))

  val oracles: Map[String, String] = Map(
    "corpus_chunk_overlap" -> chunkOverlapSql,
    "corpus_chunk_stats" -> chunkStatsSql)
}
