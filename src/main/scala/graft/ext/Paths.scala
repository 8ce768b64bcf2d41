package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** User-journey path mining — the Sankey-diagram feed: every 3-step
  * event-type path a user walks (consecutive by (ts, event_id) within
  * the user's stream, sessions NOT cut — the global-chain convention
  * of [[Events.markovTransitions]], whose first-order transitions
  * these trigrams refine), counted corpus-wide with floored-permille
  * share and per-start-step conditional share.
  *
  * Scale shape: two lead() columns on the ONE user_id clustering every
  * journey operator rides, then a map-side-combinable count onto the
  * #types³-bounded path table (125 rows here — dashboard-sized at any
  * SF); totals attach as a 1-row broadcast. */
object Paths {

  def topPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
    val tot = tri.agg(sum(col("n")).as("n_total"))
    val perStart = tri.groupBy(col("s1")).agg(sum(col("n")).as("n_start"))
    tri.join(broadcast(perStart), "s1")
      .crossJoin(broadcast(tot))
      .select(col("s1"), col("s2"), col("s3"), col("n"),
        expr("(n * 1000) div n_total").as("share_pm"),
        expr("(n * 1000) div n_start").as("cond_share_pm"))
  }

  val topPathsSql: String =
    """WITH t AS (SELECT user_id, event_type AS s1,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tri AS (SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM t WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM tri),
      |st AS (SELECT s1, CAST(SUM(n) AS BIGINT) AS n_start
      |  FROM tri GROUP BY 1)
      |SELECT tri.s1, tri.s2, tri.s3, tri.n,
      |  (tri.n * 1000) // t.n_total AS share_pm,
      |  (tri.n * 1000) // st.n_start AS cond_share_pm
      |FROM tri JOIN st USING (s1), tot t""".stripMargin

  /** Part repurchase rates — "does this product retain customers":
    * per part, how many distinct customers bought it at all vs came
    * back for it in a LATER order (distinct order dates ≥ 2 — same-
    * order line splits don't count), with floored-permille repeat
    * rate.
    *
    * Scale shape: the (part, customer) collapse is one map-side-
    * combinable agg off the orderkey-keyed fact join; the per-part
    * fold rides the part key. Output is catalog-sized. */
  def repurchaseRate(spark: SparkSession, sfDir: String): DataFrame = {
    val pc = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey"), col("o_custkey"))
      .agg(countDistinct(col("o_orderdate")).as("n_dates"))
    pc.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_dates") >= 2, 1L).otherwise(0L))
          .as("n_repeat_customers"))
      .select(col("l_partkey"), col("n_customers"),
        col("n_repeat_customers"),
        expr("(n_repeat_customers * 1000) div n_customers")
          .as("repeat_pm"))
  }

  val repurchaseRateSql: String =
    """WITH pc AS (SELECT l.l_partkey, o.o_custkey,
      |    CAST(COUNT(DISTINCT o.o_orderdate) AS BIGINT) AS n_dates
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2)
      |SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CASE WHEN n_dates >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat_customers,
      |  (CAST(SUM(CASE WHEN n_dates >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000) // COUNT(*) AS repeat_pm
      |FROM pc GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_top_paths" -> (topPaths _),
    "parts_repurchase_rate" -> (repurchaseRate _))

  val oracles: Map[String, String] = Map(
    "events_top_paths" -> topPathsSql,
    "parts_repurchase_rate" -> repurchaseRateSql)
}
