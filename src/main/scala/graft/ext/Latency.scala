package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Latency distributions — the two "how long does it take" reports on
  * either side of the engine's domain split:
  *
  *  - Order→ship latency per order priority: exact day deltas
  *    lineitem.l_shipdate − orders.o_orderdate in 30-day buckets with
  *    floored-permille shares — dashboard-sized output (priorities ×
  *    ~160 buckets) at any SF. (On this synthetic fixture the two
  *    dates are independent, so the distribution is flat — the gate
  *    exercises the plan shape, not a business conclusion; truncating
  *    `div` on the negative deltas is identical in both engines,
  *    PcaSpec's parity test.)
  *  - View→purchase conversion lead time (the funnel-latency twin of
  *    [[Funnel]]): per user, the FIRST purchase with a view strictly
  *    before it within the funnel window; latency = purchase −
  *    latest such view, bucketed in 10-minute bins. The qualification
  *    is the same strict-predecessor running-max frame the funnel
  *    rides ([[Funnel.stagesOf]] discipline) — ONE user_id exchange.
  *
  * Scale shape: ship latency is one fact join keyed on orderkey (the
  * order side collapsed to (key, date, priority) first) + a map-side-
  * combinable count; lead time is one user-keyed window + a per-user
  * top-1 + a bucket agg. All integer math (days, micros, permille). */
object Latency {

  def shipLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    val d = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("cast(datediff(l_shipdate, o_orderdate) as bigint) div 30")
          .as("bucket_30d"))
      .groupBy(col("o_orderpriority"), col("bucket_30d"))
      .agg(count(lit(1)).as("n_lines"))
    val tot = d.groupBy(col("o_orderpriority"))
      .agg(sum(col("n_lines")).as("n_total"))
    d.join(broadcast(tot), "o_orderpriority")
      .select(col("o_orderpriority"), col("bucket_30d"), col("n_lines"),
        expr("(n_lines * 1000) div n_total").as("share_pm"))
  }

  val shipLatencySql: String =
    """WITH d AS (SELECT o.o_orderpriority,
      |    CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) // 30
      |      AS bucket_30d,
      |    CAST(COUNT(*) AS BIGINT) AS n_lines
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |t AS (SELECT o_orderpriority, CAST(SUM(n_lines) AS BIGINT) AS n_total
      |  FROM d GROUP BY 1)
      |SELECT d.o_orderpriority, d.bucket_30d, d.n_lines,
      |  (d.n_lines * 1000) // t.n_total AS share_pm
      |FROM d JOIN t USING (o_orderpriority)""".stripMargin

  /** 10-minute buckets over the view→purchase lead time. */
  val BucketUs: Long = 600L * 1000000L

  def conversionLeadTime(spark: SparkSession, sfDir: String): DataFrame = {
    val strictlyBefore = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu")).rangeBetween(Window.unboundedPreceding, -1)
    val first = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .withColumn("lv", max(when(col("event_type") === "view", col("tsu")))
        .over(strictlyBefore))
      .filter(col("event_type") === "purchase" && col("lv").isNotNull &&
        col("tsu") - col("lv") <= Funnel.WMicros)
      .withColumn("rn", row_number().over(first))
      .filter(col("rn") === 1)
      .select(col("user_id"), (col("tsu") - col("lv")).as("lead_us"))
      .groupBy(expr(s"lead_us div $BucketUs").as("bucket_10min"))
      .agg(count(lit(1)).as("n_users"), sum(col("lead_us")).as("sum_lead_us"))
  }

  val conversionLeadTimeSql: String =
    s"""WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS tsu
       |  FROM events),
       |p AS (SELECT user_id, event_id, tsu,
       |    MAX(CASE WHEN event_type = 'view' THEN tsu END) OVER (
       |      PARTITION BY user_id ORDER BY tsu
       |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
       |  FROM e),
       |conv AS (SELECT user_id, tsu, lv,
       |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id)
       |      AS rn
       |  FROM (SELECT p.* FROM p JOIN e USING (user_id, event_id)
       |        WHERE e.event_type = 'purchase') q
       |  WHERE lv IS NOT NULL AND tsu - lv <= ${Funnel.WindowMin * 60000000L})
       |SELECT (tsu - lv) // $BucketUs AS bucket_10min,
       |  CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(tsu - lv) AS BIGINT) AS sum_lead_us
       |FROM conv WHERE rn = 1
       |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_ship_latency" -> (shipLatency _),
    "events_conversion_lead_time" -> (conversionLeadTime _))

  val oracles: Map[String, String] = Map(
    "orders_ship_latency" -> shipLatencySql,
    "events_conversion_lead_time" -> conversionLeadTimeSql)
}
