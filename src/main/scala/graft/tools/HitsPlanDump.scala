package graft.ext
// (lives in the tools dir; declared in ext for seam access)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Triage/evidence instrument (r18): print the physical plan of ONE
  * HITS round join — the part of partsHits that lives inside per-round
  * checkpoint actions and therefore never appears in the gated query's
  * final plan. Usage: runMain graft.ext.HitsPlanDump [gateRows]
  * (sfDir/cpus from the usual env). Not part of the driver contract. */
object HitsPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.apply)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption.foreach(g =>
      spark.conf.set("spark.graft.graph.shjRoundRowGate", g))
    val edges = Hits.purchaseEdges(spark, sfDir)
    // Round-1 h update, exactly as hitsOfPrepared builds it, with the
    // score side sized like a real round (the degree frame).
    val authDeg = edges.repartition(col("dst")).groupBy(col("dst"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val auth = authDeg.select(col("dst").as("node"), lit(Hits.Scale).as("a"))
    val aSide =
      if (spark.conf.getOption("spark.graft.graph.shjRoundRowGate")
            .exists(_.toLong <= graft.Tables.lineitemRowsMemo(spark, sfDir)))
        auth.hint("shuffle_hash")
      else auth
    val hraw = edges.join(aSide, edges("dst") === aSide("node"))
      .repartition(col("src")).groupBy(col("src"))
      .agg(sum(col("a")).as("h"))
    println(hraw.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
