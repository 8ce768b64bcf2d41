package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKPerKey custom operator (rule + strategy + exec, injected via
  * SparkSessionExtensions) must (a) actually replace the Filter+Window
  * pattern and (b) produce byte-identical results to the stock window
  * rendition, including rank values and ties-by-tiebreaker. */
class TopKPerKeySpec extends SparkSpec {

  private def topOrders(k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  test("rule fires: plan contains TopKPerKeyExec, no Window sort") {
    val p = topOrders(3).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"window operator still present:\n$p")
  }

  test("results equal the stock window rendition (rule disabled)") {
    val got = topOrders(3).collect().map(_.toString).sorted.toSeq
    val want = withRuleDisabled(topOrders(3)).map(_.toString).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("k=1 (the IVF assignment shape) equals the window rendition") {
    val got = topOrders(1).collect().map(_.toString).sorted.toSeq
    val want = withRuleDisabled(topOrders(1)).map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("rule does NOT fire for rank() or non-rn predicates") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val rankDf = Tables.orders(spark, sf)
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(!rankDf.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val geDf = Tables.orders(spark, sf)
      .withColumn("r", row_number().over(w)).filter(col("r") >= 3)
    assert(!geDf.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("property: random data, random k — operator == stock window") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(300)
      // Duplicate sort values are fine: (v, id) is a total order.
      val data = (0 until n).map(i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(20).toLong, i.toLong))
      val k = 1 + rnd.nextInt(5)
      def build = {
        val w = Window.partitionBy(col("key"))
          .orderBy(col("v").desc, col("id"))
        data.toDF("key", "v", "id")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
      }
      val got = build.collect().map(_.toString).sorted.toSeq
      assert(build.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val want = withRuleDisabled(build).map(_.toString).sorted.toSeq
      assert(got == want, s"trial $trial k=$k")
    }
  }

  test("spill fallback: past the buffer budget the exec degrades to external sort") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val key = "spark.graft.topKPerKey.maxBufferedRows"
    try {
      // Budget of 4 buffered rows: any real partition crosses it, so
      // every task takes the sort path. Results must be identical.
      spark.conf.set(key, "4")
      val df = topOrders(3)
      val got = df.collect().map(_.toString).sorted.toSeq
      // AQE hides subtrees inside leaf QueryStageExec wrappers; unwrap.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def findExecs(p: SparkPlan): Seq[graft.plans.TopKPerKeyExec] = p match {
        case a: AdaptiveSparkPlanExec => findExecs(a.executedPlan)
        case q: QueryStageExec => findExecs(q.plan)
        case e: graft.plans.TopKPerKeyExec => e +: e.children.flatMap(findExecs)
        case other => other.children.flatMap(findExecs)
      }
      val execs = findExecs(df.queryExecution.executedPlan)
      assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
      assert(execs.head.metrics("fallbackPartitions").value >= 1,
        "expected at least one partition to degrade to the sort path")
      spark.conf.unset(key)
      val want = topOrders(3).collect().map(_.toString).sorted.toSeq
      assert(got == want)
      assert(got.nonEmpty)
    } finally spark.conf.unset(key)
  }

  /** Evaluate the same logical query with the optimizer rule excluded —
    * the ground truth the custom operator must reproduce. */
  private def withRuleDisabled(df: DataFrame): Array[org.apache.spark.sql.Row] = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "graft.plans.TopKPerKeyRule")
      val rows = df.collect()
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      rows
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
