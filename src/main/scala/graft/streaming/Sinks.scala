package graft.streaming

import org.apache.spark.sql.DataFrame

/** Output-side exactly-once for streaming jobs.
  *
  * Structured Streaming guarantees each micro-batch id is processed at
  * least once after recovery (the last uncommitted batch replays); the
  * sink's job is to make replays harmless. The standard pattern is
  * idempotent-by-batch-id: every batch writes to its own
  * `batch=<id>` partition directory with overwrite mode, so a replayed
  * batch rewrites byte-identical output instead of appending
  * duplicates. Consumers read the whole directory; a partially-written
  * replay is invisible because parquet commit is atomic per directory
  * write (temporary files + rename).
  */
object Sinks {

  /** foreachBatch function: exactly-once parquet under `outDir`. */
  def idempotentParquet(outDir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, id: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
}
