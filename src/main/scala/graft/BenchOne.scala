package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.BenchOne <key> [reps]` —
  * the per-query tuning loop Bench is too coarse for. Same session
  * config as [[Bench]]; prints one line per rep plus the median, so a
  * change's effect is visible without a full 130-key run. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: BenchOne <query-key> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Same default as Bench — a tuning number taken at one parallelism
    // and compared against a full-bench number at another silently
    // mixes regimes; export SPARK_GRAFT_CPUS to change BOTH.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] rep $i: $s%.3f s ($n rows)")
      // Same untimed per-rep hygiene as Bench: protected session memos
      // survive, per-rep checkpoint debris is freed (at sf10 the HITS
      // round cuts alone accumulated to a heap OOM by rep 3 without
      // this).
      graft.ext.Frames.freeSessionState(spark)
      s
    }
    println(f"[benchone] $name median ${times.sorted.apply(reps / 2)}%.3f s")
    spark.stop()
  }
}
