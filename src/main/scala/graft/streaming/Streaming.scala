package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.Tables
import graft.kv.KvOp

/** Structured Streaming renditions of the batch analytics (SURVEY.md §2.8:
  * the reference has no streaming, but the [SPEC] kvraft op stream is the
  * natural streaming twin, and a training-data pipeline ingests event
  * streams). The gated entry points REALLY execute through the streaming
  * engine — file source → micro-batches (Trigger.AvailableNow) →
  * foreachBatch into the idempotent parquet sink — then read the sink
  * back, so the driver's DuckDB gate applies to the streaming path too.
  * No gated path uses the `memory` sink: that would hold every update
  * row on the driver (O(corpus) for per-document queries).
  *
  * Scale notes: the same code runs unbounded (continuous ingestion) by
  * swapping the trigger; state stores are per-key and spill via the
  * state-store provider (RocksDB on a real cluster); the windowed agg
  * shuffles once on the (window, type) grouping key exactly like its
  * batch twin.
  */
object Streaming {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-ckpt-").toString

  /** Fixed streaming-engine overhead (query planning/start, state-store
    * provider setup, source listing — everything OUTSIDE the per-batch
    * `triggerExecution` spans) accumulated since the last reset. Bench
    * resets this per rep and reports it as `stream_init`, separate from
    * the per-query plan cost: this dataflow cost is constant per stream
    * start (NOT per row — at 100 TB a stream starts once and runs for
    * months) and its 1.5–2× run-to-run wobble was the dominant noise in
    * the streaming medians. */
  @volatile private var initAccum = 0.0
  def resetInitCost(): Unit = synchronized { initAccum = 0.0 }
  def initCost: Double = initAccum
  private def recordInit(s: Double): Unit =
    synchronized { initAccum += math.max(s, 0.0) }

  /** Per-batch (batchId, inputRows, triggerExecution ms) spans of every
    * stream the session has run since the last reset, keyed by the
    * sink name [[runToParquet]] was given. The steady-state instrument
    * ([[SteadyState]]) reads this to separate batch-0 cold cost
    * (planning, codegen, state-store open) from the marginal micro-batch
    * cost — the honest operating number for a deployed stream — for
    * EVERY gated streaming key, not just a hand-picked one. */
  @volatile private var batchLog =
    Map.empty[String, Seq[(Long, Long, Long)]]
  def resetBatchLog(): Unit = synchronized { batchLog = Map.empty }
  def batchLogSnapshot: Map[String, Seq[(Long, Long, Long)]] = batchLog
  private def recordBatches(name: String,
      p: Seq[(Long, Long, Long)]): Unit =
    synchronized { batchLog += name -> p }

  /** Run a streaming frame to completion through a parquet sink and
    * read the result back as a batch frame.
    *
    * Update mode writes each micro-batch to its own `batch=<id>`
    * partition via [[Sinks.idempotentParquet]] (the result is the union
    * of all update rows, finalized by the caller's max_by). Complete
    * mode overwrites ONE `latest` directory per batch — each complete
    * batch IS the whole result, so overwrite is naturally idempotent
    * under replay and the read-back touches exactly one copy. A source
    * with zero rows can fire ZERO batches and write nothing at all —
    * the hasOutput guard below turns that into an empty frame instead
    * of a schema-inference failure.
    *
    * This is the scale-safe gate path: a `memory`-format sink would
    * materialize every update row on the DRIVER — O(corpus) driver state
    * for per-document queries like dedup — whereas here updates go
    * executor→parquet and only the driver-side read of the FINAL
    * aggregate is small. Checkpoint + per-batch overwrite also make the
    * write path recoverable (memory sink is not). */
  /** Streaming state-partition count (see the conf comment in
    * [[runToParquet]]); a dial, raised with state volume in production. */
  private val StatePartitions = "8"

  /** State partitions for the CHUNKED (big-corpus) replay tier — r17
    * verdict item 2: the two heaviest sf30 keys (stream dedup 114.9 s,
    * click attribution 110.7 s) ran their stateful stages 8-wide on 32
    * cores, a 4× parallelism giveaway exactly in the regime where each
    * micro-batch carries tens of millions of state rows. Sized from
    * EVENT VOLUME (one partition per ~1M events, floor 8 — the gate-SF
    * value, so the chunk-forced steady-state instrument at sf0.1 keeps
    * its 8-partition marginal-batch medians) capped at the session's
    * core count (a state partition pays a RocksDB instance per
    * operator per batch — width past the cores only multiplies that
    * fixed cost). Overridable for A/B and production via
    * SPARK_GRAFT_STREAM_STATE_PARTS. Values are state-partition-
    * invariant (the r16 burn-in pin); the gate/bench small-SF path
    * never takes this tier, so driver-graded numbers are untouched.
    * Measured sf30-uniform, isolated, 8 → 32 partitions on local[32]:
    * dedup_ids 133.0 → 67.1 s, click_attrib 132.0 → 60.2 s. */
  private def chunkedStateParts(spark: SparkSession, sfDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTS",
      math.max(8L, math.min(
        math.min(32, spark.sparkContext.defaultParallelism).toLong,
        eventsCount(spark, sfDir) / 1000000L)).toString)

  private def runToParquet(updates: DataFrame, mode: OutputMode,
      name: String, stateParts: String = StatePartitions): DataFrame = {
    val spark = updates.sparkSession
    // Production state-store posture: RocksDB spills keyed state to
    // local disk instead of holding it on the JVM heap — at 100 TB the
    // per-key state (dedup hashes, session state) outgrows executor
    // heaps long before it outgrows local disk. Set lazily so batch
    // sessions never pay for it; StreamingSpec pins checkpoint recovery
    // on this same provider.
    if (!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        .exists(_.contains("RocksDB")))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val outDir = Files.createTempDirectory(s"graft-sink-$name-").toString
    val complete = mode == OutputMode.Complete()
    val sink: (DataFrame, Long) => Unit =
      if (complete)
        (batch, _) => batch.write.mode("overwrite").parquet(s"$outDir/latest")
      else Sinks.idempotentParquet(outDir)
    val t0 = System.nanoTime()
    // State partitions are sized to STATE VOLUME, not CPU count: every
    // state partition pays a RocksDB instance per stateful operator per
    // micro-batch, so a CPU-sized 32 costs ~2× wall on the stream-stream
    // join (8.5 → 4.3 s measured) while the gate-SF state fits in a few
    // partitions with room to spare. Production raises this dial with
    // state size; result VALUES are partition-count-invariant (pinned by
    // the 32-vs-16-thread burn-in). Scoped to the stream's run and
    // restored after — batch plans keep the session setting.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", stateParts)
    try {
      val q = updates.writeStream
        .foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // Engine-init = wall time minus the per-batch triggerExecution spans
      // (which carry the actual plan + state-store work).
      val wall = (System.nanoTime() - t0) / 1e9
      val batchSecs = q.recentProgress.iterator.map { p =>
        val d = p.durationMs.get("triggerExecution")
        if (d == null) 0L else d.longValue
      }.sum / 1000.0
      recordInit(wall - batchSecs)
      recordBatches(name, q.recentProgress.toSeq.map(p => (p.batchId,
        p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).fold(0L)(_.longValue))))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // A source with zero rows can legitimately produce zero batches —
    // the sink dir is then empty and read.parquet cannot infer a
    // schema. "No data yet" is an empty result, not an error.
    val target = java.nio.file.Paths.get(
      if (complete) s"$outDir/latest" else outDir)
    val hasOutput = Files.exists(target) && {
      val listing = Files.list(target)
      try listing.findFirst().isPresent finally listing.close()
    }
    if (!hasOutput)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updates.schema)
    else if (complete) spark.read.parquet(s"$outDir/latest")
    else spark.read.parquet(outDir).drop("batch")
  }

  /** Stream the events parquet as micro-batches, normalizing `ts` the same
    * way Tables.events does (TIMESTAMP(NANOS) → timestamp_ntz micros).
    * The file source requires a directory, so the (read-only) single-file
    * table is staged into a temp dir first — in production the ingest
    * path IS a directory that files land in. */
  private val stagedSrc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage a (read-only) table into a temp DIRECTORY — the file source
    * requires one; in production the ingest path IS a directory files
    * land in. Handles both layouts a parquet table comes in: a single
    * file (this repo's fixtures) and a directory of part files (what
    * `df.write.parquet` produces). Cached per (sfDir, table). */
  private def staged(sfDir: String, table: String): String =
    stagedSrc.computeIfAbsent(s"$sfDir/$table", { _ =>
      import scala.jdk.CollectionConverters._
      val d = Files.createTempDirectory("graft-stream-src-")
      val src = java.nio.file.Paths.get(s"$sfDir/$table.parquet")
      if (Files.isDirectory(src)) {
        // Sort by filename: Files.list order is filesystem-dependent,
        // and part-file NAME order is the seq order the in-order
        // streaming contract (§7.7.5) rides on — an arbitrary listing
        // could stage later parts as earlier files.
        val listing = Files.list(src)
        val parts =
          try listing.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.getFileName.toString)
          finally listing.close()
        parts.zipWithIndex.foreach { case (p, i) =>
          // Explicit ascending mtimes: the source sorts by mtime (see
          // [[stamp]]); two sub-millisecond copies could otherwise tie
          // and stage later parts as earlier files.
          stamp(Files.copy(p, d.resolve(f"part-$i%05d.parquet")), i)
        }
      } else Files.copy(src, d.resolve(s"$table.parquet"))
      d.toString
    })

  /** Steady-state instrument dials — BOTH unset in the gate/bench path,
    * where staging and triggering are byte-identical to prior rounds:
    *  - SPARK_GRAFT_STREAM_STAGE_CHUNKS=N stages the single-file tables
    *    as N ORDERED chunk files (events via the ts-ordered daily
    *    staging, documents as doc_id ranges), the production ingest
    *    layout where files land over time;
    *  - SPARK_GRAFT_STREAM_FILES_PER_TRIGGER caps files per micro-batch
    *    on every staged source.
    * Together they give AvailableNow replays a real multi-batch steady
    * regime for [[SteadyState]] to measure, instead of draining the
    * whole corpus in batch 0. Values are batching-invariant: event
    * chunks are time-ordered (the in-order contract's axis), and every
    * per-doc/per-hash fold in the document streams is batch-commutative
    * — the gate tier pins the values either way. */
  private def stageChunks: Int =
    sys.env.get("SPARK_GRAFT_STREAM_STAGE_CHUNKS").map(_.toInt).getOrElse(1)

  /** Streaming reader over a staged directory, honoring the
    * files-per-trigger instrument cap when set. */
  private def readStaged(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, dir: String): DataFrame = {
    val r = spark.readStream.schema(schema)
    sys.env.get("SPARK_GRAFT_STREAM_FILES_PER_TRIGGER")
      .fold(r)(v => r.option("maxFilesPerTrigger", v))
      .parquet(dir)
  }

  /** [[staged]] with the chunked-staging instrument dial applied:
    * events delegate to the ts-ordered daily staging, documents are
    * split into doc_id-ranged ordered files. */
  private def stagedChunkable(spark: SparkSession, sfDir: String,
      table: String): String = {
    val k = stageChunks
    if (k <= 1) staged(sfDir, table)
    else if (table == "events") stagedDaily(spark, sfDir)
    else stagedSrc.computeIfAbsent(s"$sfDir/$table#chunks=$k", { _ =>
      import scala.jdk.CollectionConverters._
      require(table == "documents", s"chunked staging: unexpected table $table")
      val d = Files.createTempDirectory("graft-stream-src-chunks-")
      val tmp = Files.createTempDirectory("graft-stream-src-chunks-tmp-")
      spark.read.parquet(s"$sfDir/$table.parquet")
        .repartitionByRange(k, org.apache.spark.sql.functions.col("doc_id"))
        .sortWithinPartitions(org.apache.spark.sql.functions.col("doc_id"))
        .write.mode("overwrite").parquet(tmp.toString)
      val parts = {
        val listing = Files.list(tmp)
        try listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
        finally listing.close()
      }
      parts.zipWithIndex.foreach { case (p, i) =>
        stamp(Files.copy(p, d.resolve(f"part-$i%05d.parquet")), i)
      }
      d.toString
    })
  }

  def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir) // sets the nanos flag + registers functions
    val dir = stagedChunkable(spark, sfDir, "events")
    // Schema from the staged files themselves: daily-chunked staging
    // rewrites ts to timestamp_ntz micros while the single-file staging
    // keeps the raw TIMESTAMP(NANOS)->LongType shape; normalizeEventTs
    // handles both, but the reader's schema spec must match the files.
    val stagedSchema = spark.read.parquet(dir).schema
    Tables.normalizeEventTs(readStaged(spark, stagedSchema, dir))
  }

  private val chunkStagedSrc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Time-ordered MULTI-file staging of the events table — one parquet
    * file per event-time day, named in time order — the production
    * ingest layout (a directory daily drops land in). The single-file
    * staging ([[staged]]) replays the WHOLE stream as one micro-batch;
    * a watermark only advances BETWEEN batches, so a stream-stream join
    * replayed that way buffers every row of both sides in state before
    * evicting anything — state O(corpus) instead of O(window), a replay
    * artifact (continuous operation never sees it) that measured
    * ~4.2× per 3× on click attribution. Daily files + a bounded
    * files-per-trigger cap make the replay genuinely micro-batched:
    * state stays O(events within the watermark window) at any corpus
    * size. Day keys sort lexicographically = chronologically, so the
    * file-NAME order the in-order contract (§7.7.5) rides on is the
    * event-time order. */
  private def stagedDaily(spark: SparkSession, sfDir: String): String =
    chunkStagedSrc.computeIfAbsent(s"$sfDir/events", { _ =>
      import scala.jdk.CollectionConverters._
      val d = Files.createTempDirectory("graft-stream-days-")
      val tmp = Files.createTempDirectory("graft-stream-days-tmp-")
      Tables.events(spark, sfDir)
        .withColumn("chunk", date_format(col("ts"), "yyyyMMdd"))
        .repartition(col("chunk"))
        .sortWithinPartitions(col("ts"), col("event_id"))
        .write.partitionBy("chunk").mode("overwrite").parquet(tmp.toString)
      val dayDirs = {
        val listing = Files.list(tmp)
        try listing.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("chunk="))
          .toSeq.sortBy(_.getFileName.toString)
        finally listing.close()
      }
      dayDirs.zipWithIndex.foreach { case (dayDir, i) =>
        val listing = Files.list(dayDir)
        val parts =
          try listing.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
          finally listing.close()
        // One partition holds a whole day (repartition by chunk), so a
        // day dir has exactly one ts-sorted file; >1 would mean two
        // files of the SAME day whose cross-file order is undefined —
        // fail loudly rather than stage a disordered stream.
        require(parts.size == 1,
          s"day ${dayDir.getFileName} staged as ${parts.size} files")
        stamp(Files.move(parts.head, d.resolve(f"part-$i%05d.parquet")), i)
      }
      d.toString
    })

  /** Give the i-th staged file an explicitly ascending mtime. The file
    * source orders files by MODIFICATION TIME, not name, and a rename
    * keeps the mtime the shuffle task that wrote the part finished at —
    * task-completion order, not day order. Out-of-order days straddling
    * a micro-batch boundary arrive below the already-advanced watermark
    * and are DROPPED (measured: 36% of attribution pairs lost at sf3).
    * Deterministic minute-spaced stamps make mtime order = name order =
    * event-time order — the in-order contract (§7.7.5) enforced on the
    * axis the source actually sorts by. */
  private[graft] def stamp(p: java.nio.file.Path, i: Int): Unit =
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))

  /** How many daily files each micro-batch consumes in the chunked
    * replay: 10 ⇒ a 30-day fixture drains in 3 batches — enough
    * watermark advances to keep join state window-bounded without
    * paying 30 batch commits of fixed overhead. */
  private val DailyFilesPerTrigger = "10"

  /** [[eventStream]] over the daily staging — the source for the
    * stateful replays whose state would otherwise grow with the corpus
    * instead of the window (today: the stream-stream attribution
    * join). Values are batching-invariant: the sources are time-ordered
    * so no row is ever late to its own batch's watermark, and both join
    * sides read the same files per trigger. */
  def eventStreamDaily(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
    val dir = stagedDaily(spark, sfDir)
    // Schema from the STAGED files themselves, never the raw source
    // file: staging rewrites ts through Tables.events (always
    // timestamp_ntz micros), so a raw file in the legacy
    // TIMESTAMP(NANOS)->LongType shape would hand readStream a
    // LongType spec for micros data and normalizeEventTs would divide
    // by 1000 AGAIN — silent timestamp corruption in this tier only.
    // Deriving the spec from the staged write makes the two sides
    // definitionally agree.
    val stagedSchema = spark.read.parquet(dir).schema
    Tables.normalizeEventTs(
      spark.readStream.schema(stagedSchema)
        .option("maxFilesPerTrigger", sys.env.getOrElse(
          "SPARK_GRAFT_STREAM_FILES_PER_TRIGGER", DailyFilesPerTrigger))
        .parquet(dir))
  }

  /** Streaming twin of Events.windowedAgg: tumbling-hour counts + exact
    * integer-cent sums per event type, complete mode through the parquet
    * sink. Same oracle as the batch query. */
  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.ext.Events.centsSum(col("value")).as("sum_value"))
    runToParquet(agg, OutputMode.Complete(), "windowed-agg")
  }

  /** Watermarked tumbling windows in APPEND mode — the
    * closed-windows-only emission discipline (each window written
    * exactly once, when the watermark passes its end) that downstream
    * consumers of a streaming sink rely on. The drained result is every
    * window whose end the FINAL watermark (max event time − 30 min)
    * passed — a deterministic, oracle-expressible subset; the 30 min
    * delay lands mid-hour on real timestamps, so the window-end
    * comparison never sits on the boundary. Complete-mode twin:
    * [[windowedAgg]]. */
  def windowedAppendStream(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.ext.Events.centsSum(col("value")).as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("cnt"), col("sum_value"))
    runToParquet(agg, OutputMode.Append(), "windowed-append")
  }

  val windowedAppendSql: String =
    s"""WITH m AS (SELECT MAX(ts) AS max_ts FROM events)
       |SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
       |  ${graft.ext.Events.centsSumSql("value")} AS sum_value
       |FROM events
       |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
       |  <= (SELECT max_ts FROM m) - INTERVAL 30 MINUTE
       |GROUP BY 1, 2""".stripMargin

  /** Streaming twin of KvReplay.replay: per-key fold over the op stream
    * with `mapGroupsWithState`. Within a micro-batch ops are sorted by
    * `seq`; across batches the file source delivers in file order (the
    * op log is seq-ordered — SURVEY.md §7.7.5 requires a monotonic seq
    * per key, which event_id provides). Each update emits the running
    * state stamped with the last applied seq, so the final state per key
    * is the max_by(last_seq) row — deterministic under ANY batching. */
  def kvReplayUpdates(ops: Dataset[KvOp]): DataFrame = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState[(String, Long), (String, String, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KvOp], state: GroupState[(String, Long)]) =>
          val sorted = it.toArray.sortBy(_.seq)
          var (cur, lastSeq) = state.getOption.getOrElse(("", -1L))
          // In-order contract (§7.7.5) enforced at runtime: an op at or
          // below the last applied seq means a batch arrived out of
          // order — fail loudly instead of silently folding wrong.
          // Out-of-order sources belong on kvReplayEventTimeUpdates.
          if (sorted.nonEmpty && sorted.head.seq <= lastSeq)
            throw new IllegalStateException(
              s"kvReplayUpdates: out-of-order op for key '$key': incoming " +
                s"seq ${sorted.head.seq} <= last applied $lastSeq; this " +
                "source violates the in-order contract — use " +
                "kvReplayEventTimeUpdates (watermarked) instead")
          sorted.foreach { o =>
            if (o.op == "put") cur = o.value
            else if (o.op == "append") cur += o.value
            lastSeq = o.seq
          }
          state.update((cur, lastSeq))
          (key, cur, lastSeq)
      }
      .toDF("key", "value", "last_seq")
  }

  /** Driver-gated entry: stream the events-derived op log, fold with
    * state, keep each key's latest update. Oracle = the batch kv_replay
    * oracle (same final states). */
  def kvReplayStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Single source of truth for the event->op mapping: the batch
    // module's, whose oracle this query is gated against.
    val ops = graft.kv.KvReplay.opsFromEvents(eventStream(spark, sfDir))
      .filter(col("op") =!= "get")
      .as[KvOp]
    runToParquet(kvReplayUpdates(ops), OutputMode.Update(), "kv-replay")
      .groupBy("key")
      .agg(max_by(col("value"), col("last_seq")).as("value"))
  }

  /** Streaming sessionization: per-user ">30 min gap starts a session"
    * counting with `mapGroupsWithState`. State = (last event-time micros,
    * n_sessions, n_events); each update is stamped with n_events (strictly
    * increasing per user), so the final row per user is the max_by —
    * deterministic under any batching, PROVIDED batches arrive in
    * event-time order per user (§7.7.5 contract; holds for the seq-ordered
    * source files here). */
  def sessionizeUpdates(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events.select(
      col("user_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"),
      col("event_id").cast("long")).as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[(Long, Long, Long)]) =>
          val sorted = it.toArray.sortBy(e => (e._2, e._3))
          var (lastTs, nSessions, nEvents) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          // Same §7.7.5 runtime tripwire as kvReplayUpdates: an event
          // older than the last applied event time means out-of-order
          // batches — gap counting would silently miscount sessions.
          if (sorted.nonEmpty && sorted.head._2 < lastTs)
            throw new IllegalStateException(
              s"sessionizeUpdates: out-of-order event for user $uid: " +
                s"incoming ts ${sorted.head._2} < last applied $lastTs; " +
                "use an event-time/watermarked variant for this source")
          sorted.foreach { case (_, tsu, _) =>
            if (lastTs == Long.MinValue || tsu - lastTs > 1800000000L)
              nSessions += 1
            lastTs = tsu
            nEvents += 1
          }
          state.update((lastTs, nSessions, nEvents))
          (uid, nSessions, nEvents)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Driver-gated entry; oracle = the batch sessionize oracle. */
  def sessionizeStream(spark: SparkSession, sfDir: String): DataFrame =
    runToParquet(sessionizeUpdates(eventStream(spark, sfDir)),
      OutputMode.Update(), "sessionize")
      .groupBy("user_id")
      .agg(max_by(col("n_sessions"), col("n_events")).as("n_sessions"),
        max(col("n_events")).as("n_events"))

  /** One timestamped KV op for the event-time replay path. */
  case class TimedOp(ts: java.sql.Timestamp, seq: Long, key: String,
      op: String, value: String)

  /** Per-key replay state: applied value + the out-of-order buffer. */
  case class KvEtState(value: String, applied: Long,
      pending: List[(Long, Long, String, String)])

  /** Event-time KV replay for OUT-OF-ORDER delivery — the production
    * pattern when the in-order contract of [[kvReplayUpdates]] cannot be
    * guaranteed: ops buffer in state until the event-time watermark
    * passes them, then apply in (ts, seq) order. Late data inside the
    * watermark delay is reordered correctly; data later than the delay
    * is dropped by the watermark (the standard trade). Event-time
    * timeouts flush keys that receive no further input, so the buffer
    * drains without new per-key data.
    *
    * Emits (key, value, applied-count) updates; applied is strictly
    * increasing per key, so max_by(applied) is the latest state. */
  def kvReplayEventTimeUpdates(ops: Dataset[TimedOp],
      delay: String): Dataset[(String, String, Long)] = {
    import ops.sparkSession.implicits._
    ops.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[KvEtState, (String, String, Long)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[TimedOp], state: GroupState[KvEtState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(KvEtState("", 0L, Nil))
          val incoming = it.map(o => (o.ts.getTime, o.seq, o.op, o.value)).toList
          val (ready, rest) = (st.pending ++ incoming).partition(_._1 <= wm)
          var value = st.value
          ready.sortBy(p => (p._1, p._2)).foreach { case (_, _, op, v) =>
            if (op == "put") value = v else if (op == "append") value += v
          }
          state.update(KvEtState(value, st.applied + ready.size, rest))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(rest.map(_._1).min)
          if (ready.nonEmpty) Iterator((key, value, st.applied + ready.size))
          else Iterator.empty
      }
  }

  /** One buffered out-of-order op in [[KvEventTimeProcessor]] state. */
  case class PendingOp(tsMs: Long, seq: Long, op: String, value: String)

  /** [[kvReplayEventTimeUpdates]] re-expressed on transformWithState
    * with EVENT-TIME TIMERS — the modern form of the same pattern:
    * ops buffer in explicit ListState until the watermark passes them;
    * a registered event-time timer fires [[handleExpiredTimer]] when
    * the watermark advances past the earliest buffered op even if the
    * key receives no further input, so the buffer drains without new
    * per-key data (the TWS twin of EventTimeTimeout). Spec-pinned
    * equal to the flatMapGroupsWithState path on an out-of-order
    * source. */
  private class KvEventTimeProcessor
      extends StatefulProcessor[String, TimedOp, (String, String, Long)] {
    @transient private var applied: ValueState[(String, Long)] = _
    @transient private var pending: ListState[PendingOp] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      applied = getHandle.getValueState[(String, Long)]("applied",
        Encoders.product[(String, Long)], TTLConfig.NONE)
      pending = getHandle.getListState[PendingOp]("pending",
        Encoders.product[PendingOp], TTLConfig.NONE)
    }

    /** Apply every op at-or-before the watermark in (ts, seq) order,
      * re-buffer the rest, re-arm a timer at the earliest remaining
      * ts. While the watermark lags, the buffer only APPENDS (no
      * full-list rewrite per batch — ListState.put is O(buffer) state
      * writes); a stale timer with nothing ready touches no state and
      * registers nothing. */
    private def drain(key: String, incoming: List[PendingOp],
        wm: Long): Iterator[(String, String, Long)] = {
      val (ready, rest) =
        (pending.get().toList ++ incoming).partition(_.tsMs <= wm)
      if (ready.isEmpty) {
        if (incoming.nonEmpty) {
          pending.appendList(incoming.toArray)
          getHandle.registerTimer(rest.map(_.tsMs).min)
        }
        Iterator.empty
      } else {
        pending.clear()
        if (rest.nonEmpty) {
          pending.put(rest.toArray)
          getHandle.registerTimer(rest.map(_.tsMs).min)
        }
        var (value, n) = if (applied.exists()) applied.get() else ("", 0L)
        ready.sortBy(p => (p.tsMs, p.seq)).foreach { p =>
          if (p.op == "put") value = p.value
          else if (p.op == "append") value += p.value
        }
        n += ready.size
        applied.update((value, n))
        Iterator((key, value, n))
      }
    }

    override def handleInputRows(key: String, rows: Iterator[TimedOp],
        timerValues: TimerValues): Iterator[(String, String, Long)] =
      drain(key,
        rows.map(o => PendingOp(o.ts.getTime, o.seq, o.op, o.value)).toList,
        timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, String, Long)] =
      drain(key, Nil, timerValues.getCurrentWatermarkInMs())
  }

  /** Entry point for the TWS event-time replay (see
    * [[KvEventTimeProcessor]]); emits (key, value, applied-count)
    * updates, applied strictly increasing per key. */
  def kvReplayEventTimeTws(ops: Dataset[TimedOp],
      delay: String): Dataset[(String, String, Long)] = {
    import ops.sparkSession.implicits._
    ops.withWatermark("ts", delay)
      .groupByKey(_.key)
      .transformWithState(new KvEventTimeProcessor,
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Stream-stream JOIN: click→purchase attribution — each purchase
    * joined to the same user's clicks from the preceding 2 h, both
    * sides live micro-batch streams. The time-interval condition plus
    * the per-side watermarks bound the join STATE: a buffered click can
    * be evicted once the watermark says no future purchase can reach
    * back to it, so state is O(events in the watermark window), not
    * O(stream). Inner joins emit pairs as soon as both sides arrive
    * (append mode), so the drained stream equals the batch join —
    * gated against the batch clickAttribution oracle. The 3 h delay
    * covers the 2 h join reach-back plus reordering slack; the source
    * files are event-time-ordered (§7.7.5). */
  /** The attribution join itself, over two event-shaped streaming
    * frames — separated from the gated entry so specs can drive the
    * PRODUCTION join (watermarks, interval, condition) over their own
    * multi-batch sources instead of a hand-copied replica. */
  def clickAttributionJoin(purchaseEvents: DataFrame,
      clickEvents: DataFrame): DataFrame = {
    val p = purchaseEvents
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        // Stream-stream join event time must be TIMESTAMP (ltz); the
        // session TZ is pinned UTC, so the cast from ntz is faithful
        // and the joined output carries no timestamp column anyway.
        col("ts").cast("timestamp").as("pts"))
      .withWatermark("pts", "3 hours")
    val c = clickEvents
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cuid"),
        col("ts").cast("timestamp").as("cts"))
      .withWatermark("cts", "3 hours")
    p.join(c, col("user_id") === col("cuid") &&
        col("cts") >= col("pts") - expr("INTERVAL 2 HOURS") &&
        col("cts") <= col("pts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Event count past which the attribution replay switches from the
    * single-batch source to the daily-chunked one. The trade: chunked
    * replay pays a fixed per-batch cost (state-store commit + sink
    * round per micro-batch — measured ~6.8 s/extra batch at sf0.1,
    * 19.6 s chunked vs 5.9 s single) but pins join STATE to the
    * watermark window, while single-batch replay buffers EVERY row of
    * both sides in state before the watermark ever advances —
    * O(corpus) state, the one replay shape that grows without bound.
    * Same auto-tier discipline as [[graft.ext.Growth.rollingActivesAuto]]:
    * exact/fast below the cap, bounded above it, dispatched on the
    * memoized plan-time |events| count. Values are batching-invariant
    * (time-ordered sources: no row is late to its own batch's
    * watermark), so both tiers share one oracle — pinned by the
    * chunked-vs-batch equality spec. */
  private val ChunkedReplayEventCap = 2000000L

  /** Plan-time |events|, memoized per (session, sfDir) — same tag as
    * Growth's, so a verify/bench pass counts the table once total. */
  private def eventsCount(spark: SparkSession, sfDir: String): Long =
    graft.ext.Frames.scalarMemo("events_count", spark, sfDir) {
      Tables.events(spark, sfDir).count()
    }

  /** The corpus-size tier dispatch, shared by every stateful replay
    * whose state is watermark-bounded only BETWEEN batches (the
    * stream-stream join's buffered sides, dropDuplicates' id set):
    * single-batch below the cap, daily-chunked above. Forcible for the
    * tier-equality specs and BenchOne tier measurements
    * (SPARK_GRAFT_STREAM_CHUNKED=0/1 overrides in a bench child JVM). */
  private def autoChunked(spark: SparkSession, sfDir: String): Boolean =
    sys.env.get("SPARK_GRAFT_STREAM_CHUNKED") match {
      case Some("1") => true
      case Some("0") => false
      // Fail loudly on anything else ("true", a typo): a bench/verify
      // child intending to FORCE a tier must never silently measure
      // the auto-decided other one.
      case Some(other) => sys.error(
        s"SPARK_GRAFT_STREAM_CHUNKED must be '1' or '0', got '$other'")
      case None => eventsCount(spark, sfDir) > ChunkedReplayEventCap
    }

  def clickAttributionStream(spark: SparkSession, sfDir: String): DataFrame =
    clickAttributionStreamTiered(spark, sfDir, autoChunked(spark, sfDir))

  private[graft] def clickAttributionStreamTiered(spark: SparkSession,
      sfDir: String, chunked: Boolean): DataFrame = {
    def side() =
      if (chunked) eventStreamDaily(spark, sfDir)
      else eventStream(spark, sfDir)
    runToParquet(clickAttributionJoin(side(), side()),
      OutputMode.Append(), "click-attrib",
      if (chunked) chunkedStateParts(spark, sfDir) else StatePartitions)
  }

  /** Stream-STATIC join: the live event stream enriched against a
    * batch-computed dimension (per-user first-seen timestamp) — the
    * third streaming join mode next to stream-stream
    * ([[clickAttributionStream]]) and the stateful folds. The static
    * side is planned per micro-batch like any batch join (broadcast
    * while small, shuffled when not); no watermark is needed for a
    * stream-static inner join because no cross-stream state buffers.
    * Minutes are exact integer micros division on both engines — no
    * calendar datediff('minute'), whose boundary-crossing semantics
    * differ from floor division. */
  def enrichStream(spark: SparkSession, sfDir: String): DataFrame = {
    val firstSeen = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
    val enriched = eventStream(spark, sfDir)
      .join(firstSeen, Seq("user_id"))
      .select(col("event_id"), col("user_id"),
        expr("(unix_micros(cast(ts as timestamp)) - " +
          "unix_micros(cast(first_ts as timestamp))) div 60000000")
          .as("mins_since_first"))
    runToParquet(enriched, OutputMode.Append(), "enrich")
  }

  val enrichSql: String =
    """WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
      |SELECT e.event_id, e.user_id,
      |  CAST((epoch_us(e.ts) - epoch_us(f.first_ts)) // 60000000 AS BIGINT)
      |    AS mins_since_first
      |FROM events e JOIN f ON e.user_id = f.user_id""".stripMargin

  /** Streaming ID-dedup on the BUILT-IN operator: the event stream is
    * unioned with itself (the at-least-once-delivery shape an ingest
    * edge actually produces) and collapsed by
    * `dropDuplicatesWithinWatermark` on event_id — the complement of
    * [[dedupExactStream]]'s custom keyed-state dedup. State per id is
    * evicted once the watermark passes its event time plus the delay,
    * so dedup state is O(rate × window), not O(stream); duplicates
    * here arrive within a micro-batch or two, far inside the 1 h
    * delay. Rows carried through are identical per id, so the drained
    * append output equals the batch DISTINCT oracle. */
  def dedupIdsStream(spark: SparkSession, sfDir: String): DataFrame =
    dedupIdsStreamTiered(spark, sfDir, autoChunked(spark, sfDir))

  /** Tiered like the attribution join: the dedup id-set is
    * watermark-bounded state, but single-batch replay never advances
    * the watermark mid-batch, so it buffers BOTH union sides of the
    * whole corpus before evicting anything (measured 3.6× per 3.3× at
    * sf10, 65 s). Chunked replay evicts between batches — state is the
    * 1 h window. Values are tier-invariant: an event's two union copies
    * sit in the SAME staged file on both sides, so they always co-arrive
    * within one batch and dedup identically (pinned by the equality
    * spec). */
  private[graft] def dedupIdsStreamTiered(spark: SparkSession,
      sfDir: String, chunked: Boolean): DataFrame = {
    def side() =
      (if (chunked) eventStreamDaily(spark, sfDir)
       else eventStream(spark, sfDir))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"))
    val deduped = side().unionAll(side())
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
    runToParquet(deduped, OutputMode.Append(), "dedup-ids",
      if (chunked) chunkedStateParts(spark, sfDir) else StatePartitions)
  }

  val dedupIdsSql: String =
    "SELECT DISTINCT event_id, user_id, event_type FROM events"

  /** Per-user session state for [[SessionizeProcessor]]. */
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)

  /** [[sessionizeUpdates]] re-expressed on the transformWithState API
    * (Spark 4's arbitrary-state surface): explicit named ValueState,
    * the state schema evolvable and inspectable by the state reader —
    * the forward-looking twin of the mapGroupsWithState path. Same
    * fold, same §7.7.5 in-order tripwire, same oracle. */
  private class SessionizeProcessor
      extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      val sorted = rows.toArray.sortBy(e => (e._2, e._3))
      var SessState(lastTs, nSessions, nEvents) =
        if (st.exists()) st.get() else SessState(Long.MinValue, 0L, 0L)
      if (sorted.nonEmpty && sorted.head._2 < lastTs)
        throw new IllegalStateException(
          s"SessionizeProcessor: out-of-order event for user $uid: " +
            s"incoming ts ${sorted.head._2} < last applied $lastTs")
      sorted.foreach { case (_, tsu, _) =>
        if (lastTs == Long.MinValue || tsu - lastTs > 1800000000L)
          nSessions += 1
        lastTs = tsu
        nEvents += 1
      }
      st.update(SessState(lastTs, nSessions, nEvents))
      Iterator((uid, nSessions, nEvents))
    }
  }

  /** Driver-gated entry; oracle = the batch sessionize oracle. */
  def sessionizeTwsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val typed = eventStream(spark, sfDir).select(
      col("user_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"),
      col("event_id").cast("long")).as[(Long, Long, Long)]
    val updates = typed.groupByKey(_._1)
      .transformWithState(new SessionizeProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_sessions", "n_events")
    runToParquet(updates, OutputMode.Update(), "sessionize-tws")
      .groupBy("user_id")
      .agg(max_by(col("n_sessions"), col("n_events")).as("n_sessions"),
        max(col("n_events")).as("n_events"))
  }

  /** Per-user quota state for [[ThrottleProcessor]]: the CURRENT hour's
    * admission counters plus the in-order tripwire cursor. */
  case class ThrottleState(hourStart: Long, nAdm: Long, nDrop: Long,
      lastTs: Long)

  /** The per-event admission state machine behind
    * [[throttleStream]]: events arrive in order per user (§7.7.5), the
    * state is ONE hour's counters (a closed hour can never reopen under
    * in-order delivery, so state per key is O(1) — the property that
    * makes a quota enforcer cheap at any rate), and each batch emits
    * the running counters for every hour it touched; `nAdm + nDrop` is
    * strictly increasing within an hour, so max_by finalizes. */
  private class ThrottleProcessor(maxPerHour: Long)
      extends StatefulProcessor[Long, (Long, Long, Long),
        (Long, Long, Long, Long)] {
    private val HourMicros = 3600000000L
    @transient private var st: ValueState[ThrottleState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ThrottleState]("quota",
        Encoders.product[ThrottleState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val sorted = rows.toArray.sortBy(e => (e._2, e._3))
      var s = if (st.exists()) st.get()
        else ThrottleState(Long.MinValue, 0L, 0L, Long.MinValue)
      if (sorted.nonEmpty && sorted.head._2 < s.lastTs)
        throw new IllegalStateException(
          s"ThrottleProcessor: out-of-order event for user $uid: " +
            s"incoming ts ${sorted.head._2} < last applied ${s.lastTs}")
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      sorted.foreach { case (_, tsu, _) =>
        val hour = tsu - tsu % HourMicros
        if (hour != s.hourStart) {
          if (s.hourStart != Long.MinValue)
            out += ((uid, s.hourStart, s.nAdm, s.nDrop)) // hour closed
          s = ThrottleState(hour, 0L, 0L, tsu)
        }
        if (s.nAdm < maxPerHour) s = s.copy(nAdm = s.nAdm + 1, lastTs = tsu)
        else s = s.copy(nDrop = s.nDrop + 1, lastTs = tsu)
      }
      st.update(s)
      if (s.hourStart != Long.MinValue)
        out += ((uid, s.hourStart, s.nAdm, s.nDrop)) // running partial
      out.iterator
    }
  }

  /** Streaming rate-limiter twin of the batch
    * `events_throttle_hourly`: per-event first-N-per-hour admission
    * through O(1) keyed quota state; the drained counters must equal
    * the batch count arithmetic — the oracle is the batch SQL. */
  def throttleStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val typed = graft.ext.Events.eventsWithBursts(eventStream(spark, sfDir))
      .select(
        col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"),
        col("event_id").cast("long")).as[(Long, Long, Long)]
    val updates = typed.groupByKey(_._1)
      .transformWithState(
        new ThrottleProcessor(graft.ext.Events.ThrottleMax),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "hour_us", "n_admitted", "n_dropped")
    runToParquet(updates, OutputMode.Update(), "throttle")
      .groupBy(col("user_id"), col("hour_us"))
      .agg(max_by(struct(col("n_admitted"), col("n_dropped")),
        col("n_admitted") + col("n_dropped")).as("s"))
      .select(col("user_id"),
        expr("cast(timestamp_micros(hour_us) as timestamp_ntz)").as("hour"),
        col("s.n_admitted").as("n_admitted"),
        col("s.n_dropped").as("n_dropped"))
  }

  /** Streaming exact dedup — first-seen-wins per content hash with
    * keyed state, the shape of a streaming ingestion dedup stage. State
    * per hash is (keeper = min doc_id, cnt); each update is stamped with
    * cnt (strictly increasing per hash) so max_by(cnt) is the final
    * state. Oracle = the batch dedup_exact oracle. */
  def dedupExactStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir) // registers graft functions
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = readStaged(spark, raw.schema,
      stagedChunkable(spark, sfDir, "documents"))
      .select(md5(col("text")).as("h"), col("doc_id")).as[(String, Long)]
    val updates = docs.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (h: String, it: Iterator[(String, Long)], state: GroupState[(Long, Long)]) =>
          val ids = it.map(_._2).toArray
          var (keeper, cnt) = state.getOption.getOrElse((Long.MaxValue, 0L))
          ids.foreach { id => if (id < keeper) keeper = id }
          cnt += ids.length
          state.update((keeper, cnt))
          (h, keeper, cnt, cnt)
      }
      .toDF("h", "keeper", "cnt", "version")
    runToParquet(updates, OutputMode.Update(), "dedup-exact")
      .groupBy("h")
      .agg(max_by(col("keeper"), col("version")).as("keeper"),
        max(col("cnt")).as("cnt"))
      .select(col("h"), col("cnt"), col("keeper"))
  }

  /** Streaming token accounting — corpus_tokenize in the INGEST path:
    * documents stream in, words fan out map-side, the STATIC tokenized
    * vocabulary (derived once from the batch corpus — the frozen-
    * tokenizer deployment shape, same posture as [[enrichStream]]'s
    * static dimension) enriches each word with its greedy piece counts,
    * and a per-doc stateful aggregation accumulates exact token totals.
    * The pieces side is planned per micro-batch like any stream-static
    * join; per-doc state is one 3-long row per document (the same
    * per-key-state posture as [[dedupExactStream]]). Docs that never
    * produce a word are restored by a post-drain left join against the
    * corpus spine, mirroring the batch query's LEFT-join discipline.
    * Oracle = the batch corpus_tokenize oracle. */
  def tokenizeStream(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val pieces = graft.ext.Tokenize.pieceFrame(spark, sfDir)
    val docs = readStaged(spark, raw.schema,
      stagedChunkable(spark, sfDir, "documents"))
    val words = graft.ext.Tokenize.wordsOf(docs)
    val perDoc = words.join(pieces, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_tokens"),
        sum(col("n_vocab_pieces")).as("n_vocab_tokens"))
    val drained = runToParquet(perDoc, OutputMode.Update(), "tokenize")
      .groupBy(col("doc_id"))
      .agg(max(col("n_words")).as("n_words"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("n_vocab_tokens")).as("n_vocab_tokens"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(drained, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_vocab_tokens"), lit(0L)).as("n_vocab_tokens"))
  }

  /** Streaming twin of ext.Funnel: the windowed any-entry funnel as a
    * per-user SEQUENTIAL STATE MACHINE — the shape funnels actually
    * take in production streams, where events arrive over days and the
    * batch query's whole-partition window frames don't exist. State per
    * user is four longs: last applied ts (the §7.7.5 in-order
    * tripwire), newest view ts, newest QUALIFIED click ts, and the
    * stage reached. The batch query's running maxima over
    * strict-predecessor frames collapse to exactly these scalars when
    * events are folded in (ts, event_id) order: a click qualifies iff
    * the NEWEST strictly-earlier view is within the window (the newest
    * view minimizes the gap, so it decides for all views), same for
    * purchases against qualified clicks. Stage is monotone, so the
    * final rollup is max per user; the oracle is the batch funnel's.
    *
    * Tied timestamps: the batch query's strict-predecessor frame means a
    * click at t qualifies against the newest view STRICTLY before t —
    * a view also at t must not decide it (and must not clobber the
    * decider). So the state keeps the TWO newest distinct view
    * timestamps (and likewise qualified-click timestamps): for an event
    * at t, the newest strictly-earlier view is `lastView` when
    * lastView < t, else `prevView` (t < lastView is impossible — ts is
    * monotone under the in-order contract). That answers the strict
    * predecessor exactly even when the tied view arrived in an EARLIER
    * micro-batch, and makes the result independent of event_id order
    * within a tie — matching batch, which never sees event_id. */
  def funnelUpdates(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val W = graft.ext.Funnel.WMicros
    val typed = events.select(
      col("user_id").cast("long"),
      col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"),
      col("event_id").cast("long")).as[(Long, String, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String, Long, Long)],
            state: GroupState[(Long, Long, Long, Long, Long, Long)]) =>
          val sorted = it.toArray.sortBy(e => (e._3, e._4))
          var (lastApplied, lastView, prevView, lastQC, prevQC, stage) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue,
              Long.MinValue, Long.MinValue, Long.MinValue, 0L))
          if (sorted.nonEmpty && sorted.head._3 < lastApplied)
            throw new IllegalStateException(
              s"funnelUpdates: out-of-order event for user $uid: " +
                s"incoming ts ${sorted.head._3} < last applied $lastApplied; " +
                "use an event-time/watermarked variant for this source")
          // Newest tracked ts strictly before t (MinValue = none).
          def strictlyBefore(t: Long, last: Long, prev: Long): Long =
            if (last < t) last else prev
          var applied = 0L
          sorted.foreach { case (_, tpe, tsu, _) =>
            tpe match {
              case "view" =>
                if (tsu > lastView) { prevView = lastView; lastView = tsu }
                if (stage < 1L) stage = 1L
              case "click" =>
                val lv = strictlyBefore(tsu, lastView, prevView)
                if (lv != Long.MinValue && tsu - lv <= W) {
                  if (tsu > lastQC) { prevQC = lastQC; lastQC = tsu }
                  if (stage < 2L) stage = 2L
                }
              case "purchase" =>
                val lqc = strictlyBefore(tsu, lastQC, prevQC)
                if (lqc != Long.MinValue && tsu - lqc <= W) {
                  if (stage < 3L) stage = 3L
                }
              case _ => ()
            }
            lastApplied = tsu
            applied += 1
          }
          state.update((lastApplied, lastView, prevView, lastQC, prevQC, stage))
          (uid, stage, applied)
      }
      .toDF("user_id", "stage", "applied")
  }

  /** Driver-gated entry; oracle = the batch funnel-users oracle. */
  def funnelStream(spark: SparkSession, sfDir: String): DataFrame =
    runToParquet(funnelUpdates(eventStream(spark, sfDir)),
      OutputMode.Update(), "funnel")
      .groupBy("user_id")
      .agg(max(col("stage")).as("stage"))

  /** One SCD-2 interval emission: ver orders re-emissions of the same
    * island (closure always outranks any open emission — see
    * [[scd2Updates]]). */
  case class Scd2Out(user_id: Long, event_type: String, valid_from_us: Long,
      valid_to_us: Option[Long], first_eid: Long, n_events: Long,
      is_current: Boolean, ver: Long)

  /** Per-user open-island state for the streaming SCD-2 build. */
  case class Scd2St(lastTs: Long, lastEid: Long, openType: String,
      openFrom: Long, openEid: Long, openN: Long)

  /** Streaming twin of [[graft.ext.Events.scd2UserType]] — the SCD-2
    * interval build maintained INCREMENTALLY: each user's open island
    * lives in state; an event of a new type closes it (emitting the
    * closed interval with its valid_to) and opens the next. Closed
    * islands are immutable — the streaming shape SCD-2 is built for:
    * the warehouse merge only ever touches each user's current row.
    *
    * Emission versioning: an island (keyed user_id × first event id) is
    * re-emitted as its n_events grows (ver = 2n) and exactly once on
    * closure (ver = 2n+1, which outranks every open emission since the
    * closing event starts the NEXT island and never increments n) — so
    * the read side's max_by(ver) per island reconstructs the batch
    * frame exactly. In-order contract + tripwire as [[funnelUpdates]];
    * ties inside a batch re-sort by (ts, event_id), the batch build's
    * total order. */
  def scd2Updates(events: DataFrame): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    val typed = events.select(
      col("user_id").cast("long"),
      unix_micros(col("ts").cast("timestamp")).as("tsu"),
      col("event_id").cast("long"),
      col("event_type")).as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Scd2St, Scd2Out](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[Scd2St]) =>
          val sorted = it.toArray.sortBy(e => (e._2, e._3))
          var st = state.getOption.getOrElse(
            Scd2St(Long.MinValue, Long.MinValue, null, 0L, 0L, 0L))
          if (sorted.nonEmpty && (sorted.head._2 < st.lastTs ||
              (sorted.head._2 == st.lastTs && sorted.head._3 < st.lastEid)))
            throw new IllegalStateException(
              s"scd2Updates: out-of-order event for user $uid: incoming " +
                s"(${sorted.head._2}, ${sorted.head._3}) < last applied " +
                s"(${st.lastTs}, ${st.lastEid}); use an event-time variant")
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Out]
          sorted.foreach { case (_, tsu, eid, typ) =>
            if (st.openType == null)
              st = Scd2St(tsu, eid, typ, tsu, eid, 1L)
            else if (typ != st.openType) {
              out += Scd2Out(uid, st.openType, st.openFrom, Some(tsu),
                st.openEid, st.openN, is_current = false, st.openN * 2 + 1)
              st = Scd2St(tsu, eid, typ, tsu, eid, 1L)
            } else st = st.copy(lastTs = tsu, lastEid = eid,
              openN = st.openN + 1)
          }
          if (st.openType != null)
            out += Scd2Out(uid, st.openType, st.openFrom, None, st.openEid,
              st.openN, is_current = true, st.openN * 2)
          state.update(st)
          out.iterator
      }
  }

  /** Driver-gated entry; oracle = the batch SCD-2 oracle. */
  def scd2Stream(spark: SparkSession, sfDir: String): DataFrame =
    runToParquet(scd2Updates(eventStream(spark, sfDir)).toDF(),
      OutputMode.Update(), "scd2")
      .groupBy(col("user_id"), col("first_eid"))
      .agg(max_by(struct(col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("is_current")),
        col("ver")).as("r"))
      .select(col("user_id"), col("r.event_type").as("event_type"),
        expr("cast(timestamp_micros(r.valid_from_us) as timestamp_ntz)")
          .as("valid_from"),
        expr("cast(timestamp_micros(r.valid_to_us) as timestamp_ntz)")
          .as("valid_to"),
        col("r.n_events").as("n_events"),
        col("r.is_current").as("is_current"))

  /** Streaming curation admission — the ship gate's quality+dedup
    * filter in the INGEST path: documents stream in, the quality score
    * is pure map-side kernel work per row, and the duplicate-keeper
    * membership is a stream-static LEFT SEMI join against the
    * batch-derived keeper set (the frozen-reference deployment shape:
    * the keeper snapshot updates per ingest cycle, the stream filters
    * against it continuously — same static-side posture as
    * [[enrichStream]] and [[tokenizeStream]]). Stateless — Append mode,
    * no state store; every admitted doc is emitted exactly once.
    * Oracle = the batch corpus_curate oracle. */
  def curateStream(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    Tables.documents(spark, sfDir) // registers graft kernels
    val keepers = graft.ext.Dedup.fingerprintDedup(spark, sfDir)
      .select(col("keeper").as("doc_id"))
    val docs = readStaged(spark, raw.schema,
      stagedChunkable(spark, sfDir, "documents"))
    val admitted = docs
      .select(col("doc_id"),
        graft.ext.TextAnalysis.qualityScoreCol.as("quality_score"))
      .filter(col("quality_score") >= 0.5)
      .join(keepers, Seq("doc_id"), "left_semi")
    runToParquet(admitted, OutputMode.Append(), "curate")
  }

  /** Streaming A/B readout — the experiment dashboard in the ingest
    * path: the fact-sized work (per-user purchase/error counters) runs
    * as ONE incremental streaming aggregation (per-user Long state,
    * Complete mode — each batch emits the whole per-user frame, so the
    * sink overwrite is idempotent under replay); the constant-size 2×2
    * + chi-square finisher runs on the read-back, shared verbatim with
    * the batch path ([[graft.ext.Experiment.readoutFromCounts]] — the
    * same finisher seam as the kv twin's max_by read side). Oracle =
    * the batch A/B oracle: the streaming counters must land on the
    * identical cells. */
  def abTestStream(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = graft.ext.Experiment.perUserCounts(
      eventStream(spark, sfDir))
    graft.ext.Experiment.readoutFromCounts(
      runToParquet(counts, OutputMode.Complete(), "ab-test"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_stream_ab_test" -> (abTestStream _),
    "corpus_curate_stream" -> (curateStream _),
    "events_stream_funnel" -> (funnelStream _),
    "dedup_exact_stream" -> (dedupExactStream _),
    "events_stream_windowed_agg" -> (windowedAgg _),
    "kv_replay_stream" -> (kvReplayStream _),
    "events_stream_sessionize" -> (sessionizeStream _),
    "events_stream_sessionize_tws" -> (sessionizeTwsStream _),
    "events_stream_click_attrib" -> (clickAttributionStream _),
    "events_stream_dedup_ids" -> (dedupIdsStream _),
    "events_stream_throttle" -> (throttleStream _),
    "events_stream_enrich" -> (enrichStream _),
    "events_stream_windowed_append" -> (windowedAppendStream _),
    "corpus_tokenize_stream" -> (tokenizeStream _),
    "events_stream_scd2" -> (scd2Stream _))

  val oracles: Map[String, String] = Map(
    "events_stream_ab_test" -> graft.ext.Experiment.abTestSql,
    "corpus_curate_stream" -> graft.ext.Curation.curateSql,
    "events_stream_funnel" -> graft.ext.Funnel.funnelUsersSql,
    "dedup_exact_stream" -> graft.ext.Dedup.exactSql,
    "events_stream_windowed_agg" -> graft.ext.Events.windowedAggSql,
    "kv_replay_stream" -> graft.kv.KvReplay.oracleSql,
    "events_stream_sessionize" -> graft.ext.Events.sessionizeSql,
    "events_stream_sessionize_tws" -> graft.ext.Events.sessionizeSql,
    "events_stream_click_attrib" -> graft.ext.Events.clickAttributionSql,
    "events_stream_dedup_ids" -> dedupIdsSql,
    "events_stream_throttle" -> graft.ext.Events.throttleHourlySql,
    "events_stream_enrich" -> enrichSql,
    "events_stream_windowed_append" -> windowedAppendSql,
    "corpus_tokenize_stream" -> graft.ext.Tokenize.corpusTokenizeSql,
    "events_stream_scd2" -> graft.ext.Events.scd2UserTypeSql)
}
