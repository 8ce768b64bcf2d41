package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for shuffled equi-joins at scale.
  *
  * First choice on Spark 3+/4 is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code change. This utility is the MANUAL salting pattern for the cases
  * AQE can't fix (e.g. a single hot key inside one task of a
  * non-sort-merge join, or engines/pipelines where AQE is off): spread
  * each hot fact key over `salts` synthetic sub-keys and replicate the
  * (small) build side across all salts. Result set is exactly the plain
  * join's.
  *
  * The salt must be deterministic under retries but uncorrelated with the
  * join key — a hash of the whole fact row works and keeps the operation
  * reproducible (no RNG state, no partition dependence).
  */
object Skew {

  /** Inner equi-join `fact ⋈ build` on `key`, salted `salts` ways.
    * `build` rows are replicated `salts`× (keep it the small side). */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltCol: Column =
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Gated end-to-end use: per-nation order revenue computed THROUGH
    * the salted join (orders fact × customer build on custkey, 8
    * salts), against an oracle that joins plain — the invariant that
    * makes salting deployable is that it never changes the result set,
    * and this proves it on real data, not just the spec's fixture.
    * Money follows the integer-cents rule (Events.centsSum). */
  def saltedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val build = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    saltedJoin(fact, build, "custkey", 8)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        Events.centsSum(col("o_totalprice")).as("revenue"))
  }

  val saltedRevenueSql: String =
    s"""SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  ${Events.centsSumSql("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1""".stripMargin

  /** Join-key skew DIAGNOSTIC — the measurement you run before reaching
    * for [[saltedJoin]] or relying on AQE's splitter: for each fact
    * join key the warehouse shuffles on, the key cardinality, row
    * count, the hottest key's row count, and the hot/uniform ratio in
    * integer permille (`max·n_keys·1000 div n_rows`; exactly 1000 =
    * perfectly uniform, 5000 = the hottest key is 5× a uniform share —
    * past ~10000 a single task owns a disproportionate shuffle
    * partition and salting pays). Each audit is one map-side-combinable
    * key count collapsed to a single row — O(#audited keys) output at
    * any scale, the dashboard a shuffle-health monitor polls. */
  def skewReport(spark: SparkSession, sfDir: String): DataFrame = {
    def audit(name: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"))
        .select(lit(name).as("join_key"), col("n_keys"), col("n_rows"),
          col("max_rows"),
          expr("max_rows * n_keys * 1000 div n_rows").as("skew_pm"))
    audit("lineitem.l_orderkey", Tables.lineitem(spark, sfDir), "l_orderkey")
      .unionAll(audit("lineitem.l_partkey",
        Tables.lineitem(spark, sfDir), "l_partkey"))
      .unionAll(audit("orders.o_custkey", Tables.orders(spark, sfDir), "o_custkey"))
      .unionAll(audit("events.user_id", Tables.events(spark, sfDir), "user_id"))
  }

  val skewReportSql: String = {
    def one(name: String, table: String, key: String): String =
      s"""SELECT '$name' AS join_key,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(MAX(c) AS BIGINT) AS max_rows,
         |  (CAST(MAX(c) AS BIGINT) * CAST(COUNT(*) AS BIGINT) * 1000)
         |    // CAST(SUM(c) AS BIGINT) AS skew_pm
         |FROM (SELECT $key, COUNT(*) AS c FROM $table GROUP BY $key)""".stripMargin
    Seq(
      one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("orders.o_custkey", "orders", "o_custkey"),
      one("events.user_id", "events", "user_id"))
      .mkString("\nUNION ALL\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted_revenue" -> (saltedRevenue _),
    "join_skew_report" -> (skewReport _))

  val oracles: Map[String, String] = Map(
    "join_salted_revenue" -> saltedRevenueSql,
    "join_skew_report" -> skewReportSql)
}
