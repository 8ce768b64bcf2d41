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

  // ----------------------------------------------------- triangle count

  /** Per-node triangle counts and local clustering coefficients over
    * the co-purchase graph — the third classic graph workload next to
    * the iterative ([[partsPagerank]]) and the transitive
    * ([[Components]]): how CLIQUISH is each part's neighborhood
    * (lcc = triangles / C(deg,2), floored permille — the standard
    * community-structure / link-spam signal).
    *
    * The algorithm is the degree-ordered orientation (MapReduce
    * triangle counting à la Cohen / Suri-Vassilvitskii): orient every
    * undirected edge from its (deg, id)-smaller endpoint to the larger,
    * build wedges only at each edge's LOW-degree pivot, and close them
    * against the oriented edge list. Every triangle materializes
    * exactly once (at its minimum endpoint in the total order), and —
    * the scale point — wedge fan-out is Σ_u outdeg(u)² where outdeg is
    * bounded by O(√|E|) on any graph under degree orientation, so a
    * celebrity node with a million neighbors contributes wedges only
    * through its few HIGHER-degree peers, not C(10⁶,2). The naive
    * wedge join on raw adjacency detonates on exactly that node. The
    * DuckDB oracle brute-forces the canonical a<b<c three-way join —
    * no orientation at all — so the pruned plan must reproduce the
    * exact triangle multiset.
    *
    * Shuffles: degree agg (map-side combinable), two deg joins to
    * orient, one src-keyed wedge self-join, one (v,w)-keyed closure
    * join, one node-keyed count. All equi-joins; nothing all-pairs. */
  def partsTriangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOf(Basket.copurchase(spark, sfDir)
      .select(col("part_a").as("a"), col("part_b").as("b")))

  /** Degree-ordered orientation + its wedge candidates, split out so the
    * planted-hub spec can measure the fan-out the orientation is FOR:
    * on a star graph every edge points INTO the hub, so the hub builds
    * zero wedges while a naive adjacency self-join would build
    * C(hub_degree, 2). Returns (degrees, oriented edges, wedges). */
  private[graft] def orientedWedges(edgesIn: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val edges = edgesIn.localCheckpoint()
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val withDeg = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // src -> dst with src strictly smaller in the (deg, id) total order;
    // dd = deg(dst) rides along to order wedge legs without a re-join.
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint()
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.dd") < col("y.dd") ||
            (col("x.dd") === col("y.dd") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("u"), col("x.dst").as("v"),
        col("y.dst").as("w"))
    (deg, oriented, wedges)
  }

  /** The count itself over any canonical (a < b, distinct) undirected
    * edge frame — split out for BasketSpec's hand graphs. */
  private[graft] def trianglesOf(edgesIn: DataFrame): DataFrame = {
    val (deg, oriented, wedges) = orientedWedges(edgesIn)
    val tris = wedges.join(oriented.select(col("src").as("v"),
        col("dst").as("w")), Seq("v", "w"))
      .localCheckpoint()
    val perNode = tris.select(col("u").as("node"))
      .unionAll(tris.select(col("v").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("part"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("triangles"),
        when(col("deg") > 1L,
          expr("(2000 * coalesce(tri, 0L)) div (deg * (deg - 1))"))
          .otherwise(0L).as("lcc_permille"))
  }

  /** Brute force on purpose: canonical x<y<z three-way edge join, no
    * degree orientation — the complete ground truth the oriented plan
    * must reproduce node-for-node. */
  val partsTrianglesSql: String =
    s"""WITH pairs AS (${Basket.copurchaseSql}),
       |e AS (SELECT part_a AS a, part_b AS b FROM pairs),
       |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1 JOIN e e2 ON e1.b = e2.a
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pernode AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
       |    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
       |    UNION ALL SELECT z FROM tri) GROUP BY 1)
       |SELECT deg.node AS part, deg.deg,
       |  COALESCE(tri, 0) AS triangles,
       |  CASE WHEN deg.deg > 1
       |       THEN (2000 * COALESCE(tri, 0)) // (deg.deg * (deg.deg - 1))
       |       ELSE 0 END AS lcc_permille
       |FROM deg LEFT JOIN pernode ON deg.node = pernode.node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parts_pagerank" -> (partsPagerank _),
    "parts_triangles" -> (partsTriangles _))

  // MATERIALIZED CTEs: the unrolled PageRank rounds chain CTE
  // references and DuckDB's default inlining re-expands the prefix per
  // reference (sf1 audit: 460 s → seconds; see Hashing.materializeCtes).
  val oracles: Map[String, String] = Map(
    "parts_pagerank" -> Hashing.materializeCtes(partsPagerankSql),
    "parts_triangles" -> Hashing.materializeCtes(partsTrianglesSql))
}
