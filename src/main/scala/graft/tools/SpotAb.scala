package graft.tools

import org.apache.spark.sql.SparkSession

/** Regime-comparable attribution probe for scaled-SF per-key
  * elevations (round-16 verdict #1).
  *
  * The problem it solves: the sf30-uniform full-surface session showed
  * a bucket of TPC-H/dim-key shapes at 4–10× per 3× data, and isolated
  * re-runs proved REGIME-INCOMPARABLE for attribution — a cold JVM
  * re-reads the 7.1 GB fixtures from the page cache up (isolated q21
  * 187 s vs 47 s in-session), so "is it the plan or the session?"
  * could not be answered. This main holds the regime FIXED — one warm
  * JVM, fixtures pre-touched, every variant timed back-to-back — and
  * varies exactly one thing at a time:
  *
  *   - `auto`:  the default broadcast thresholds (what the bench ran);
  *   - `bcast`: thresholds pinned HIGH (512 MB) — any dim that crossed
  *     10 MB at sf30 and silently flipped its join to SMJ flips back;
  *   - `shuf`:  thresholds pinned to -1 — every join shuffles, the
  *     plan a 100 TB cluster would run for non-broadcastable dims.
  *
  * Reading the line: `bcast << auto` ⇒ the elevation was a broadcast
  * flip (and `shuf` tells you what the honest at-scale cost is);
  * `bcast ≈ auto` ⇒ the flip is not the story — storage/page-cache
  * pressure or a real plan defect (take the `auto` number against the
  * sf10 in-session median for the slope). Each key gets one untimed
  * warm-up per variant (memo/codegen) and `reps` timed runs; medians
  * printed as one JSON line per key plus a `spotab_total` trailer.
  *
  * Measurement caveat (round-17, learned on q21): for a spill-heavy
  * key the FIRST variant's timed reps can read 2-3× high even after
  * the untimed warm-up — residual cold state (page-cache fill of the
  * key's column chunks, spill paths, C2) decays over several
  * executions, not one. A flag from this probe where the first-listed
  * variant is the slow one is NOT yet attribution: re-run the key
  * through [[SpotPlan]] (variants worst-expected-first, AQE-final plan
  * captured) before concluding anything. q21's "auto 104.9 vs shuf
  * 34.7" inverted under position control; the REAL defect was visible
  * only in the captured plan (a doubled fact exchange).
  *
  * Not part of the driver contract — a triage instrument, launched
  * like the scaled benches (raw java on a frozen classpath). */
object SpotAb {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_scaled/sf30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SPOT_REPS", "2").toInt.max(1)
    val keys = args.toSeq match {
      case Seq() => Seq("q1_pricing_summary", "q2_min_cost_supplier",
        "q3_top_orders", "q4_priority_count", "q6_forecast_revenue",
        "q17_small_qty_revenue", "q19_disjunctive", "q21_late_suppliers",
        "dedup_phash", "knn_recall_audit", "integrity_audit",
        "corpus_ngram_novelty", "parts_similar_items",
        "orders_ship_latency", "parts_abc_pareto")
      case ks => ks
    }
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pre-touch every fixture ONCE so no variant pays the cold
    // page-cache read the isolated r16 spots drowned in.
    val t0 = System.nanoTime()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    System.err.println(f"[spotab] pre-touch ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val variants = Seq(
      "auto" -> "10485760b", // Spark default 10 MB
      "bcast" -> "536870912b", // 512 MB: undo any sf30 flip
      "shuf" -> "-1") // no broadcast anywhere: the huge-dim plan
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown key '$key'"))
      val meds = variants.map { case (name, thr) =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", thr)
        try { fn(spark, sfDir).count(); () } // untimed warm-up per variant
        catch { case _: Throwable => () }
        val ts = (1 to reps).map { _ =>
          val t = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case _: Throwable => false }
          val sec = (System.nanoTime() - t) / 1e9
          if (ok) sec else -1.0
        }.filter(_ >= 0)
        graft.ext.Frames.freeSessionState(spark)
        name -> median(ts)
      }
      // restore defaults between keys
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
        "10485760b")
      def r3(v: Double) = math.rint(v * 1000) / 1000
      println(s"""{"key":"$key",${meds.map { case (n, v) =>
        s""""$n":${r3(v)}""" }.mkString(",")},"reps":$reps,"sf":"$sfDir"}""")
    }
    println(s"""{"key":"spotab_total","n_keys":${keys.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
