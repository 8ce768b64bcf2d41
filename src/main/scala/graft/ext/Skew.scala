package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
