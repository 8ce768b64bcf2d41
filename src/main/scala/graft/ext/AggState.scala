package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental aggregate maintenance — the rolling-ingest shape for
  * corpus-level statistics at 100 TB: instead of recomputing a
  * per-(source, lang) profile over the whole corpus on every ingest,
  * keep a persisted STATE table of mergeable partials (counts, sums,
  * mins/maxes — each a commutative monoid) and fold the new batch's
  * partials into it. Derived measures (averages) are computed at read
  * time from the merged sums, never stored — storing a ratio would
  * make the state non-mergeable.
  *
  * The gate replays one ingest step with [[Incremental]]'s
  * deterministic split (idHash(doc_id) % 4 == 0 → the arriving batch):
  * state(old) merged with state(batch) must equal the full recompute
  * the DuckDB oracle runs over ALL documents — the algebraic identity
  * that makes the incremental path safe to ship. AggStateSpec proves
  * the parquet persist→reload→merge cycle byte-identical and that a
  * 4-way split merged stepwise equals the one-shot aggregate
  * (associativity under the real file format, not just in memory).
  *
  * Scale: each state frame is O(#source × #lang) rows; the merge is a
  * groupBy over two tiny frames. The only corpus-sized work is the one
  * map-side-combinable partial agg per ingest — exactly one shuffle of
  * #groups rows per batch, independent of snapshot size.
  */
object AggState {

  /** Mergeable per-(source, lang) state of a document set. */
  def stateOf(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  /** Fold any number of state frames into one (monoid merge). */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionAll _)
      .groupBy(col("source"), col("lang"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("chars")).as("chars"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))

  /** Read-time derivation: merged state + the derived average. */
  def finish(state: DataFrame): DataFrame =
    state.select(col("source"), col("lang"), col("n_docs"), col("chars"),
      col("first_doc"), col("last_doc"),
      expr("chars div n_docs").as("avg_chars"))

  /** One ingest step: snapshot state ⊎ batch state, then derive. */
  def aggIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val old = docs.filter(!Incremental.isNew(col("doc_id")))
    val batch = docs.filter(Incremental.isNew(col("doc_id")))
    finish(merge(Seq(stateOf(old), stateOf(batch))))
  }

  /** The oracle never sees the split: a full one-shot recompute. */
  val aggIncrementalSql: String =
    """SELECT source, lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  MIN(doc_id) AS first_doc,
      |  MAX(doc_id) AS last_doc,
      |  CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars
      |FROM documents GROUP BY source, lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_incremental" -> (aggIncremental _))

  val oracles: Map[String, String] = Map(
    "agg_incremental" -> aggIncrementalSql)
}
