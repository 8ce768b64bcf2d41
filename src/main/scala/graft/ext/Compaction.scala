package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Small-files compaction planning: assign documents to size-targeted
  * output files. The 100 TB operational problem this models: a corpus
  * written by many small ingest batches fragments into millions of tiny
  * parquet files, and scan throughput collapses under per-file open
  * cost; the fix is a periodic compaction pass that rewrites each
  * source-partition into ~[[TargetBytes]] files. Planning WHICH doc
  * lands in WHICH output file must be deterministic (idempotent re-runs,
  * resumable after failure) and distributed (no driver loop over files).
  *
  * The assignment rule is start-offset binning: docs are laid out in
  * (source, doc_id) order, and a doc belongs to the file its START byte
  * falls in — `file_no = (cum_bytes − doc_bytes) div TargetBytes`. One
  * window prefix-sum per source partition computes it; files can
  * overhang the target by at most one document (the standard bin-pack
  * relaxation — splitting documents across files is not an option).
  *
  * Scale shape: ONE window sort per source partition (the per-source doc
  * list is the unit a compactor rewrites anyway) and a map-side
  * combinable rollup; no global sort, no driver state. The same
  * prefix-sum-then-bin shape as [[Packing]]'s token packer — this is the
  * FILE-layout instance of it.
  */
object Compaction {

  /** Target output-file size. Small so the sf0.001 fixture still yields
    * multi-file plans; the rule is size-free (any target works). */
  val TargetBytes = 2048L

  /** Per-(source, planned file): doc count, bytes, id range — the
    * manifest a compactor executes, and the report a human audits
    * (files at ~target confirm the plan; a one-doc giant file flags an
    * outlier document, not a planner bug). */
  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("file_no",
        expr(s"(cum - bytes) div $TargetBytes").cast("long"))
      .groupBy(col("source"), col("file_no"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  val compactionPlanSql: String =
    s"""WITH d AS (SELECT source, doc_id,
       |    CAST(n_chars AS BIGINT) AS bytes FROM documents),
       |c AS (SELECT source, doc_id, bytes,
       |    SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT source,
       |  CAST((cum - bytes) // $TargetBytes AS BIGINT) AS file_no,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(bytes) AS BIGINT) AS bytes,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Zone-map pruning selectivities the planned layout would deliver.
    * Data skipping is THE scan-cost lever at 100 TB: a `n_chars > T`
    * predicate never opens a file whose per-file max is ≤ T (the
    * min/max footer stats every columnar format carries — parquet
    * row-group stats, Iceberg/Delta manifests). This gate computes, for
    * a fixed dial of thresholds, how many of the planned files a reader
    * could skip and how many docs that avoids scanning — turning the
    * layout's data-skipping value into a graded number instead of a
    * design claim. Per-file stats ride the same window prefix-sum as
    * [[compactionPlan]]; the threshold dial is a constant ×4 map-side
    * explode, then a 4-row rollup. */
  def minmaxPruning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val files = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("file_no",
        expr(s"(cum - bytes) div $TargetBytes").cast("long"))
      .groupBy(col("source"), col("file_no"))
      .agg(count(lit(1)).as("n_docs"), max(col("bytes")).as("max_bytes"))
    files
      .withColumn("threshold",
        explode(array(lit(500L), lit(1000L), lit(2000L), lit(4000L))))
      .groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(col("max_bytes") <= col("threshold"), 1L).otherwise(0L))
          .as("n_skipped"),
        sum(when(col("max_bytes") <= col("threshold"), col("n_docs"))
          .otherwise(0L)).as("docs_skipped"))
      .withColumn("skip_permille",
        expr("n_skipped * 1000 div n_files").cast("long"))
  }

  val minmaxPruningSql: String =
    s"""WITH d AS (SELECT source, doc_id,
       |    CAST(n_chars AS BIGINT) AS bytes FROM documents),
       |c AS (SELECT source, doc_id, bytes,
       |    SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d),
       |f AS (SELECT source,
       |    CAST((cum - bytes) // $TargetBytes AS BIGINT) AS file_no,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(MAX(bytes) AS BIGINT) AS max_bytes
       |  FROM c GROUP BY 1, 2)
       |SELECT CAST(threshold AS BIGINT) AS threshold,
       |  CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(CASE WHEN max_bytes <= threshold THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_skipped,
       |  CAST(SUM(CASE WHEN max_bytes <= threshold THEN n_docs ELSE 0 END)
       |    AS BIGINT) AS docs_skipped,
       |  CAST(SUM(CASE WHEN max_bytes <= threshold THEN 1 ELSE 0 END)
       |    * 1000 // COUNT(*) AS BIGINT) AS skip_permille
       |FROM f CROSS JOIN (VALUES (500), (1000), (2000), (4000))
       |  t(threshold)
       |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_compaction_plan" -> (compactionPlan _),
    "layout_minmax_pruning" -> (minmaxPruning _))

  val oracles: Map[String, String] = Map(
    "layout_compaction_plan" -> compactionPlanSql,
    "layout_minmax_pruning" -> minmaxPruningSql)
}
