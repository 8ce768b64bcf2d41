package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Link prediction over the co-purchase graph: score part pairs that are
  * NOT yet connected but share neighbors (Liben-Nowell & Kleinberg 2003
  * — the common-neighbors / Jaccard family), the "customers who buy A
  * and B also tend to buy C" candidate generator.
  *
  * Scale posture: the wedge self-join is the graph analog of the basket
  * pair explosion — a degree-d node contributes C(d,2) candidate pairs,
  * so one celebrity hub detonates a task. The gated path therefore caps
  * every adjacency list at its [[MaxNeighbors]] STRONGEST edges
  * (by co-purchase support, id-tiebroken — deterministic and
  * retry-stable) before wedging, bounding per-node fan-out at
  * C(MaxNeighbors, 2) at any scale. On the corpus the cap never fires
  * (max degree 51/13/6 at sf0.001/0.01/0.1 — the support filter already
  * thins the graph, and densification runs AGAINST scale here: a larger
  * catalog spreads baskets thinner), which is what the gate proves: the capped Spark result must
  * equal the UNCAPPED oracle (the mega-basket guard pattern,
  * [[Basket.MaxBasket]]). LinkPredictionSpec plants a hub past the cap
  * to prove the guard fires.
  *
  * Scores are integer-exact: common-neighbor counts are Longs, Jaccard
  * over neighbor sets is floored integer permille (cross-engine-safe
  * `div`, never a double divide).
  */
object LinkPrediction {

  /** Adjacency-list cap: per-node wedge fan-out ≤ C(64,2) = 2016 (the
    * [[Basket.MaxBasket]] bound, for the same reason at the next layer). */
  val MaxNeighbors = 64

  /** Predictions kept per (canonical lesser) endpoint. */
  val TopPredictions = 5

  /** Candidate-pair scoring over an explicit symmetric neighbor frame —
    * the seam the planted-hub spec drives directly. */
  private[graft] def predictionsOf(nbrs: DataFrame, edges: DataFrame,
      maxNeighbors: Int): DataFrame = {
    val wcap = Window.partitionBy(col("node"))
      .orderBy(col("w").desc, col("nbr"))
    val capped = nbrs
      .withColumn("rn", row_number().over(wcap))
      .filter(col("rn") <= maxNeighbors)
      .select(col("node"), col("nbr"))
    val deg = capped.groupBy(col("node").as("d_node"))
      .agg(count(lit(1)).as("deg"))
    // Wedges: two capped neighbors of the same middle, canonical a < b.
    val cand = capped.as("x").join(capped.as("y"),
        col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
      .groupBy(col("x.nbr").as("pa"), col("y.nbr").as("pb"))
      .agg(count(lit(1)).as("cn"))
    // Keep only pairs that are NOT already edges (prediction, not recall).
    val fresh = cand.join(edges,
      col("pa") === col("part_a") && col("pb") === col("part_b"),
      "left_anti")
    val scored = fresh
      .join(deg, col("pa") === col("d_node"))
      .withColumnRenamed("deg", "da").drop("d_node")
      .join(deg, col("pb") === col("d_node"))
      .withColumnRenamed("deg", "db").drop("d_node")
      // When the cap fires, adjacency is asymmetric (a middle keeps a
      // neighbor whose own capped list dropped it), so the wedge count
      // cn is not bounded by the capped degrees and da + db - cn can
      // reach zero or below. Clamp cn to min(da, db) for the Jaccard
      // term so capped-mode scores stay in [0, 1000]; uncapped (the
      // gated corpus path, where the oracle proves the cap a no-op)
      // the clamp is an identity because cn ≤ min(da, db) by
      // construction.
      .withColumn("jaccard_e3",
        expr("least(cn, da, db) * 1000 div (da + db - least(cn, da, db))")
          .cast("long"))
    val wr = Window.partitionBy(col("pa"))
      .orderBy(col("cn").desc, col("jaccard_e3").desc, col("pb"))
    scored
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= TopPredictions)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("cn").as("common_neighbors"), col("jaccard_e3"), col("rank"))
  }

  /** Gated: top-[[TopPredictions]] predicted new edges per part over the
    * session-memoized co-purchase graph ([[Basket.copurchase]] — the
    * support-filtered, mega-basket-guarded pair frame the whole graph
    * family rides). */
  def linkPrediction(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Basket.copurchase(spark, sfDir)
      .select(col("part_a"), col("part_b"), col("n_orders"))
    val nbrs = edges.select(col("part_a").as("node"),
        col("part_b").as("nbr"), col("n_orders").as("w"))
      .union(edges.select(col("part_b"), col("part_a"), col("n_orders")))
    predictionsOf(nbrs, edges, MaxNeighbors)
  }

  /** Oracle is UNCAPPED — equality proves the adjacency cap is a no-op
    * on support-filtered data, the salted-join result-identity pattern. */
  // Materialized (the oracle engine otherwise re-expands the copurchase
  // build once per `e` reference and `nb` twice into the wedge join —
  // sf3: 900 s ORACLE-TIMEOUT under standard children; r12 needed a
  // fat-child retry). `fresh` is an ANTI-JOIN rather than NOT EXISTS:
  // same semantics, and it keeps materialized CTEs out of correlated
  // subqueries entirely (the engine-misexecution shape documented in
  // Hashing.materializeCtes is recursion-specific, but nothing here
  // needs correlation in the first place).
  val linkPredictionSql: String = Hashing.materializeCtes(
    s"""WITH e AS (${Basket.copurchaseSql}),
       |nb AS (SELECT part_a AS node, part_b AS nbr FROM e
       |       UNION ALL SELECT part_b, part_a FROM e),
       |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM nb
       |        GROUP BY 1),
       |cand AS (SELECT x.nbr AS pa, y.nbr AS pb,
       |    CAST(COUNT(*) AS BIGINT) AS cn
       |  FROM nb x JOIN nb y ON x.node = y.node AND x.nbr < y.nbr
       |  GROUP BY 1, 2),
       |fresh AS (SELECT c.pa, c.pb, c.cn
       |  FROM cand c LEFT JOIN e
       |    ON e.part_a = c.pa AND e.part_b = c.pb
       |  WHERE e.part_a IS NULL),
       |sc AS (SELECT pa, pb, cn,
       |    CAST(cn * 1000 // (da.deg + db.deg - cn) AS BIGINT)
       |      AS jaccard_e3
       |  FROM fresh, deg da, deg db
       |  WHERE da.node = pa AND db.node = pb)
       |SELECT pa AS part_a, pb AS part_b, cn AS common_neighbors,
       |  jaccard_e3, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pa
       |    ORDER BY cn DESC, jaccard_e3 DESC, pb) AS rank FROM sc)
       |WHERE rank <= $TopPredictions""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parts_link_prediction" -> (linkPrediction _))

  val oracles: Map[String, String] = Map(
    "parts_link_prediction" -> linkPredictionSql)
}
