package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A/B experiment readout: deterministic hash-bucket arm assignment and
  * an exact 2×2 chi-square independence test — the analysis an
  * event-driven product runs continuously (Kohavi et al., "Controlled
  * experiments on the web", KDD 2007). Arm assignment MUST be a pure
  * function of the unit id (sticky across sessions, reproducible in
  * backfills): here [[Hashing.idHash]] parity, the same splitter the
  * sampling family uses.
  *
  * The conversion metric is scale-free by construction — "the user's
  * purchases outnumber their errors" — so the readout stays non-
  * degenerate at every SF without a tuned threshold constant.
  *
  * Exactness: all four 2×2 cells are Long counts from ONE map-side-
  * combinable pass (per-user rollup, then a 1-row agg). The chi-square
  * statistic is the textbook N·(ad−bc)²/(r₁r₂c₁c₂): ad−bc is computed
  * EXACTLY in Long (bounded by (U/2)², safe far past test SFs), and
  * only the final square/divide happens in double with a pinned
  * operation order — both engines then produce the identical IEEE
  * value. Zero margins (a degenerate table) are defined as chi2 = 0
  * on both sides rather than left to each engine's x/0 convention.
  */
object Experiment {

  /** Per-user purchase/error counts — the only fact-sized aggregation;
    * the streaming twin computes THIS incrementally and shares
    * [[readoutFromCounts]] for everything after. */
  private[graft] def perUserCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("ne"))

  /** 2×2 cells + chi-square from a (user_id, np, ne) frame. */
  private[graft] def readoutFromCounts(perUserNp: DataFrame): DataFrame = {
    val perUser = perUserNp
      .select((Hashing.idHash(col("user_id")) % 2).as("arm"),
        (col("np") > col("ne")).as("conv"))
    val cells = perUser.agg(
      sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("a"),
      sum(when(col("arm") === 0 && !col("conv"), 1L).otherwise(0L)).as("b"),
      sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c"),
      sum(when(col("arm") === 1 && !col("conv"), 1L).otherwise(0L)).as("d"))
    cells.select(
      (col("a") + col("b") + col("c") + col("d")).as("n_users"),
      col("a"), col("b"), col("c"), col("d"),
      expr("CASE WHEN a + b = 0 THEN 0 ELSE a * 1000 div (a + b) END")
        .cast("long").as("conv_a_permille"),
      expr("CASE WHEN c + d = 0 THEN 0 ELSE c * 1000 div (c + d) END")
        .cast("long").as("conv_b_permille"),
      expr("""CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0
              THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(a+b+c+d AS DOUBLE)
                   * CAST(a*d - b*c AS DOUBLE)
                   * CAST(a*d - b*c AS DOUBLE)
                   / (CAST(a+b AS DOUBLE) * CAST(c+d AS DOUBLE)
                      * CAST(a+c AS DOUBLE) * CAST(b+d AS DOUBLE))
              END""").as("chi2"))
  }

  def abTest(spark: SparkSession, sfDir: String): DataFrame =
    readoutFromCounts(perUserCounts(Tables.events(spark, sfDir)))

  val abTestSql: String =
    s"""WITH pu AS (
       |  SELECT (${Hashing.idHashSql("user_id")}) % 2 AS arm,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS conv
       |  FROM events GROUP BY user_id),
       |cells AS (SELECT
       |    CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(SUM(CASE WHEN arm = 0 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(SUM(CASE WHEN arm = 1 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM pu)
       |SELECT CAST(a + b + c + d AS BIGINT) AS n_users, a, b, c, d,
       |  CAST(CASE WHEN a + b = 0 THEN 0 ELSE a * 1000 // (a + b) END
       |    AS BIGINT) AS conv_a_permille,
       |  CAST(CASE WHEN c + d = 0 THEN 0 ELSE c * 1000 // (c + d) END
       |    AS BIGINT) AS conv_b_permille,
       |  CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0
       |  THEN CAST(0.0 AS DOUBLE)
       |  ELSE CAST(a+b+c+d AS DOUBLE)
       |       * CAST(a*d - b*c AS DOUBLE)
       |       * CAST(a*d - b*c AS DOUBLE)
       |       / (CAST(a+b AS DOUBLE) * CAST(c+d AS DOUBLE)
       |          * CAST(a+c AS DOUBLE) * CAST(b+d AS DOUBLE))
       |  END AS chi2
       |FROM cells""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_ab_test" -> (abTest _))

  val oracles: Map[String, String] = Map(
    "events_ab_test" -> abTestSql)
}
