package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.engine.Tokenizer
import graft.functions.GraftFunctions

/** Deterministic cardinality sketch: KMV (k-minimum-values).
  *
  * Spark's `approx_count_distinct` is HyperLogLog++ — a fine estimator
  * but not reproducible in another engine, so it can't be oracle-gated.
  * KMV over our explicit 31-bit polynomial hash IS: both engines take
  * the k smallest DISTINCT hash values and compute the same integer
  * estimate  est = (k-1)·P div h_k  (the classic KMV estimator with
  * hashes uniform on [0, P)).
  *
  * Scale shape: hash map-side, distinct + take-ordered(k) — the shuffle
  * carries at most k values per partition (TakeOrdered partial), never
  * the full distinct set. Exactly the sketch contract: fixed tiny state
  * regardless of input size.
  */
object Sketches {

  private val K = 64

  /** KMV distinct estimate over the corpus's 3-word shingle hashes (the
    * high-cardinality universe the dedup layer works in — the synthetic
    * word vocabulary itself is tiny). Output one row: (n_hashes,
    * kth_hash, est_distinct, exact_distinct); exact is cheap at test
    * scale — at 100 TB you would drop it, the estimate is the product. */
  def kmvDistinctWords(spark: SparkSession, sfDir: String): DataFrame = {
    val distinctH = Tables.documents(spark, sfDir)
      .select(explode(GraftFunctions.shingleHashes(
        GraftFunctions.wordHashes(col("text")), 3)).as("h"))
      .distinct()
    val mink = distinctH.orderBy(col("h")).limit(K)
    val scale = (K - 1).toLong * graft.ext.Hashing.P // fits: < 2^38
    // Fewer than k distinct hashes ⇒ the sketch holds the whole set and
    // IS the exact count (the standard KMV small-cardinality case).
    // The max(h) = 0 guard keeps both engines on that exact branch if
    // the k-th smallest hash were 0 (Spark `div` yields NULL where
    // DuckDB `//` errors — they would diverge instead of degrading
    // together; unreachable for k > 1 over distinct hashes, guarded so
    // the invariant is explicit, mirrored in the oracle SQL).
    // exact_distinct joins in as a 1-row aggregate so the whole query
    // stays ONE lazy plan (no job at DataFrame-construction time).
    mink.agg(
      count(col("h")).as("n_hashes"),
      max(col("h")).as("kth_hash"),
      expr(s"CASE WHEN count(h) < $K OR max(h) <= 0 THEN count(h) " +
        s"ELSE ${scale}L div max(h) END").as("est_distinct"))
      .crossJoin(distinctH.agg(count(lit(1)).as("exact_distinct")))
  }

  val kmvDistinctWordsSql: String = {
    import graft.ext.Hashing.{shingleHashesSql, wordHashesSql, P}
    s"""WITH h AS (
       |  SELECT DISTINCT unnest(sh) AS h FROM (
       |    SELECT ${shingleHashesSql("whs", 3)} AS sh FROM (
       |      SELECT ${wordHashesSql("text")} AS whs FROM documents))),
       |mink AS (SELECT h FROM h ORDER BY h LIMIT $K)
       |SELECT COUNT(h) AS n_hashes, MAX(h) AS kth_hash,
       |  CASE WHEN COUNT(h) < $K OR MAX(h) <= 0 THEN COUNT(h)
       |       ELSE ${(K - 1).toLong * P} // MAX(h) END AS est_distinct,
       |  (SELECT COUNT(*) FROM h) AS exact_distinct
       |FROM mink""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_distinct" -> (kmvDistinctWords _))

  val oracles: Map[String, String] = Map(
    "sketch_kmv_distinct" -> kmvDistinctWordsSql)
}
