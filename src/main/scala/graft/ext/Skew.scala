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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted_revenue" -> (saltedRevenue _))

  val oracles: Map[String, String] = Map(
    "join_salted_revenue" -> saltedRevenueSql)
}
