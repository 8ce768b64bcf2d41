package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Integer-exact PageRank over the part co-purchase graph — the
  * canonical ITERATIVE graph computation (beyond the pointer-jumping
  * of connected components): K fixed damped iterations of
  * pr'(v) = 0.15·S + 0.85·Σ_{u→v} pr(u)/deg(u), carried out entirely
  * in scaled Long arithmetic (S = 10⁶; every divide is an integer
  * `div`, truncation identical to DuckDB's `//` on the all-positive
  * domain), so the fixpoint trajectory is bit-identical across
  * engines and partitionings — float PageRank sums would be
  * fold-order-dependent and ungateable.
  *
  * Scale shape: per iteration one join of the edge list against the
  * O(nodes) rank frame (shuffle keyed on src) and one map-side-
  * combinable sum keyed on dst — the Pregel-on-DataFrames pattern.
  * The edge list and degree frame are computed once and
  * localCheckpointed (K+1 consumers; the q15 multi-consumer lineage
  * cut). The K rounds themselves stay UNROLLED in one plan: at fixed
  * small K the 5-join tree is well within Catalyst's depth and a
  * per-round eager checkpoint measurably hurts (3.8 s → 2.2 s at
  * sf0.1 when removed — each checkpoint forces a blocking
  * materialization). Checkpoint per round only when iteration depth
  * grows with data, as in [[Components]]' O(log n) pointer-jumping.
  * The graph is undirected (both edge directions), so every node has
  * deg ≥ 1 and there are no dangling-mass corrections to fold in.
  */
object PageRank {

  val Iters = 5
  val Scale = 1000000L

  /** K iterations over an arbitrary DIRECTED (src, dst) edge frame in
    * which every node appears as a src (no dangling mass) — the
    * reusable operator; the gate feeds it the symmetrized co-purchase
    * graph. */
  def pagerankOf(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var pr = deg.select(col("src").as("node"), lit(Scale).as("pr"))
    for (_ <- 1 to Iters) {
      val share = pr.join(deg, pr("node") === deg("src"))
        .select(col("node"), expr("pr div deg").as("share"))
      pr = edges.join(share, edges("src") === share("node"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("s"))
        .select(col("dst").as("node"),
          expr(s"${Scale * 15L / 100L}L + (85L * s) div 100L").as("pr"))
    }
    pr.join(deg, pr("node") === deg("src"))
      .select(col("node").as("part"), col("deg"), col("pr"))
  }

  def partsPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Basket.copurchase(spark, sfDir)
      .select(col("part_a"), col("part_b"))
    pagerankOf(pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst"))))
  }

  /** The same K iterations unrolled as chained CTEs. */
  val partsPagerankSql: String = {
    val base =
      s"""pairs AS (${Basket.copurchaseSql}),
         |edges AS (SELECT part_a AS src, part_b AS dst FROM pairs
         |          UNION ALL
         |          SELECT part_b, part_a FROM pairs),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS dg
         |        FROM edges GROUP BY 1),
         |p0 AS (SELECT src AS node, CAST($Scale AS BIGINT) AS pr FROM deg)"""
        .stripMargin
    val steps = (1 to Iters).map { k =>
      s"""p$k AS (SELECT e.dst AS node,
         |  CAST(${Scale * 15L / 100L} + (85 * SUM(p.pr // d.dg)) // 100
         |    AS BIGINT) AS pr
         |FROM edges e
         |JOIN p${k - 1} p ON p.node = e.src
         |JOIN deg d ON d.src = e.src
         |GROUP BY 1)""".stripMargin
    }
    s"""WITH $base,
       |${steps.mkString(",\n")}
       |SELECT p.node AS part, d.dg AS deg, p.pr
       |FROM p$Iters p JOIN deg d ON d.src = p.node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parts_pagerank" -> (partsPagerank _))

  val oracles: Map[String, String] = Map(
    "parts_pagerank" -> partsPagerankSql)
}
