package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deep-triage sibling of [[SpotAb]]: one key, a one-dial-at-a-time
  * conf matrix, and the AQE-FINAL executed plan captured per variant —
  * for the cases where SpotAb's three-point medians show a pathology
  * (e.g. `auto` slower than `shuf`) that only the runtime-adaptive
  * plan can explain. Variants run WORST-EXPECTED-FIRST (the reverse of
  * SpotAb) so a "first variant absorbs residual cold state" artifact
  * cannot manufacture the pathology being chased.
  *
  * usage: SpotPlan <key> (sfDir/cpus/reps from the SpotAb env vars)
  * Not part of the driver contract — a triage instrument. */
object SpotPlan {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse(sys.error("usage: SpotPlan <key>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_scaled/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SPOT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastQe: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        lastQe = qe
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    })

    val t0 = System.nanoTime()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    System.err.println(
      f"[spotplan] pre-touch ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val fn = graft.SparkEntry.queries.getOrElse(key,
      sys.error(s"unknown key '$key'"))
    // (name, static autoBroadcastJoinThreshold, adaptive threshold)
    val variants = Seq(
      ("shuf", "-1", "-1"), // no broadcast anywhere
      ("bcast", "536870912b", "536870912b"), // pin high
      ("auto_noaqe", "10485760b", "-1"), // default static, AQE flip off
      ("auto", "10485760b", "10485760b")) // the bench default, LAST
    variants.foreach { case (name, stat, adap) =>
      // Reset per variant: a variant whose warm-up AND every timed rep
      // fail must print "no plan captured", not the PREVIOUS variant's
      // plan under this variant's header (r17 advisory).
      lastQe = null
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", stat)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", adap)
      try { fn(spark, sfDir).count(); () } // untimed warm-up
      catch { case e: Throwable =>
        System.err.println(s"[spotplan] $name warm-up failed: $e") }
      val ts = (1 to reps).map { i =>
        val t = System.nanoTime()
        // NonFatal only: an OOM/linkage error must kill the probe loudly,
        // not be recorded as a silently dropped rep (r17 advisory).
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case scala.util.control.NonFatal(e) =>
                   System.err.println(s"[spotplan] $name rep $i failed: $e")
                   false }
        val sec = (System.nanoTime() - t) / 1e9
        if (ok) sec else -1.0
      }.filter(_ >= 0)
      graft.ext.Frames.freeSessionState(spark)
      def r3(v: Double) = math.rint(v * 1000) / 1000
      println(s"""{"key":"$key","variant":"$name","median":${r3(median(ts))},"reps":${ts.size}}""")
      Thread.sleep(2000) // listener bus drain
      if (lastQe != null) {
        println(s"----- $name final plan -----")
        println(lastQe.executedPlan.toString)
      } else println(s"----- $name: no plan captured -----")
    }
    spark.stop()
  }
}
