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
  * duplicates. Consumers read the whole directory.
  *
  * Consistency contract, stated plainly: idempotence is a steady-state
  * guarantee — after a replay COMPLETES the directory equals the
  * no-failure output. A reader racing the replay window itself can
  * observe the batch dir mid-rewrite (overwrite deletes before it
  * recommits); readers that need isolation from in-flight recovery
  * should gate on a manifest/_SUCCESS marker or read snapshots.
  */
object Sinks {

  /** foreachBatch function: exactly-once parquet under `outDir`. */
  def idempotentParquet(outDir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, id: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
}
