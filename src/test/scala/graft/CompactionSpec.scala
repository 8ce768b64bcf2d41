package graft

import org.apache.spark.sql.functions._

import graft.ext.Compaction

/** Compaction-plan invariants: partition of the corpus, deterministic,
  * bounded overhang. */
class CompactionSpec extends SparkSpec {

  private lazy val plan = Compaction.compactionPlan(spark, sf)

  test("plan is a partition: every doc in exactly one file, bytes conserved") {
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    val totalBytes = docs.agg(sum(col("n_chars").cast("long")))
      .collect()(0).getLong(0)
    val p = plan.agg(sum("n_docs"), sum("bytes")).collect()(0)
    assert(p.getLong(0) == totalDocs)
    assert(p.getLong(1) == totalBytes)
  }

  test("file numbering is contiguous from 0 within each source") {
    val bad = plan.groupBy("source")
      .agg(min("file_no").as("lo"), max("file_no").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1L)
    assert(bad.count() == 0)
  }

  test("start-offset rule: a file exceeds target only via its last doc") {
    // Any file's bytes minus its largest doc must be < TargetBytes —
    // the overhang is at most one document by construction.
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val assigned = docs.withColumn("cum", sum(col("b")).over(w))
      .withColumn("file_no",
        expr(s"(cum - b) div ${Compaction.TargetBytes}").cast("long"))
    val slack = assigned.groupBy("source", "file_no")
      .agg((sum("b") - max("b")).as("without_last"))
      .filter(col("without_last") >= Compaction.TargetBytes)
    assert(slack.count() == 0)
  }
}
