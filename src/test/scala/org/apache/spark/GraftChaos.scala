package org.apache.spark

import org.apache.spark.shuffle.FetchFailedException

/** Test-only seam into Spark's failure machinery (lives in the
  * `org.apache.spark` package because `BlockManager` is
  * `private[spark]`). Throws a REAL `FetchFailedException` — the signal
  * the DAGScheduler treats as "a map output is lost": it unregisters
  * the named map output and resubmits the MAP STAGE, exercising the
  * stage-retry path that plain task-failure injection
  * (`RuntimeException` in a task) never reaches. The Spark-honest
  * analog of the reference harness's adversarial network, which drops
  * RPC replies so completed map work must be redone
  * (`/root/reference/src/labrpc/labrpc.go:219-300`). */
object GraftChaos {
  def throwFetchFailed(shuffleId: Int, reduceId: Int): Nothing =
    throw new FetchFailedException(
      SparkEnv.get.blockManager.blockManagerId,
      shuffleId, 0L, 0, reduceId, "graft injected fetch failure")
}
