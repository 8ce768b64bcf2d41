package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{KV, MapReduce}

/** Executor-kill chaos harness — the last rung of the reference's fault
  * story (`/root/reference/src/main/test-mr.sh:283-330` kills whole
  * worker PROCESSES mid-job via `src/mrapps/crash.go:20-32`, an app
  * that crashes its own worker, and requires output equal to the
  * failure-free run). The Spark-honest twin: a `local-cluster[2,2,1024]`
  * session (2 REAL executor JVMs, separate processes from this driver),
  * a wordcount job whose map task halts its OWN executor JVM on the
  * first attempt (`Runtime.halt` — no shutdown hooks, exactly a
  * `kill -9`), and an equality assertion against the failure-free run
  * AND the declarative `mr_wordcount` gate result.
  *
  * Runs as a CHILD process (spawned by ChaosKillSpec): local-cluster
  * needs its own SparkContext and must not share the suite JVM's
  * session. Emits one machine-readable verdict line:
  * `CHAOSKILL equal=<b> gate_equal=<b> removed=<n> retried_stages=<n>
  * failed_tasks=<n>`.
  */
object ChaosKillMain {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-chaos-kill")
      // Executor JVMs are launched by the in-process standalone Worker
      // and need the graft classes + JDK17 opens this JVM has.
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // The representative gated computation: mr_wordcount's semantics
    // through the engine façade (MapReduceSpec proves façade == gate).
    val input = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("key"), col("text").as("value"))
      .as[KV]
      .repartition(8) // several map tasks per executor, two shuffle tiers
    // NO localCheckpoint here: checkpoint blocks live on executors and
    // die with them (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the chaos
    // run) — under executor-kill chaos the input must stay recomputable
    // from its parquet lineage. The production queries' localCheckpoints
    // are a single-app-lifetime trade; a deployment that needs
    // kill-survival swaps them for reliable checkpoints or persisted
    // intermediates.
    def tokenize(s: String): Seq[String] =
      s.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
    val mapClean: MapReduce.MapF =
      (_, text) => tokenize(text).map(w => KV(w, "1"))
    // crash.go twin: the APP kills its own worker process mid-task.
    // Deterministic (partition 0, first attempt of the first stage
    // attempt) instead of the reference's 1/3 coin — same recovery
    // machinery, no flaky timing. halt(), not exit(): no shutdown
    // hooks, indistinguishable from kill -9.
    val mapCrash: MapReduce.MapF = (k, text) => {
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
          tc.stageAttemptNumber() == 0)
        Runtime.getRuntime.halt(137)
      mapClean(k, text)
    }
    val reduceF: MapReduce.ReduceF = (_, vs) => vs.size.toString

    def collectJob(mapF: MapReduce.MapF): Map[String, Long] =
      MapReduce.runJob(input, mapF, reduceF)
        .collect().map(kv => kv.key -> kv.value.toLong).toMap

    val clean = collectJob(mapClean)

    val removed = new AtomicInteger(0)
    val retriedStages = new AtomicInteger(0)
    val failedTasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (s.stageInfo.attemptNumber() > 0) retriedStages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) failedTasks.incrementAndGet()
    })

    val chaos = collectJob(mapCrash)

    // Gate cross-check: the declarative mr_wordcount result on the same
    // cluster — the chaos run must equal what the gate publishes.
    val gate = SparkEntry.queries("mr_wordcount")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // Listener bus is async; the counters only grow, so poll until the
    // kill's footprint (one removal + one task failure) is visible,
    // with the old fixed sleep as the fallback deadline — a loaded box
    // can take longer than any fixed nap, and an early exit here would
    // flake the spec's >=1 assertions.
    val deadline = System.nanoTime() + 20_000_000_000L
    while ((removed.get < 1 || failedTasks.get < 1) &&
        System.nanoTime() < deadline)
      Thread.sleep(200)
    println(s"CHAOSKILL equal=${chaos == clean} gate_equal=${chaos == gate} " +
      s"removed=${removed.get} retried_stages=${retriedStages.get} " +
      s"failed_tasks=${failedTasks.get}")
    spark.stop()
    sys.exit(0)
  }
}
