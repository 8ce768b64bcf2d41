package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community structure over the part co-purchase graph — the last wing
  * of the graph family next to the iterative ([[PageRank]]), transitive
  * ([[Components]]), local ([[PageRank.partsTriangles]]) and
  * shortest-hop ([[Bfs]]) workloads:
  *
  *  - [[partsCommunities]]: synchronous label propagation (Raghavan/
  *    Albert/Kumara 2007) — each node adopts the label held by the
  *    PLURALITY of its neighbors, ties to the smallest label, for a
  *    fixed [[LpaRounds]] rounds. The fixed round count is semantic,
  *    not a convergence heuristic: synchronous LPA can oscillate
  *    forever on bipartite structure, so "the label frame after K
  *    rounds" is the well-defined operator both engines compute —
  *    the same fixed-unroll discipline as [[PageRank]].
  *  - [[partsKcore]]: iterative 2-core peeling — drop nodes whose
  *    degree in the SURVIVING subgraph is < [[CoreK]], for
  *    [[PeelRounds]] rounds. The k-core is the standard
  *    link-spam/noise filter run before community detection at scale
  *    (a page linked once is not community evidence).
  *
  * Scale shape, per LPA round: one edge⋈label equi-join keyed on dst,
  * one map-side-combinable (node, label) count, one per-node top-1
  * window riding the node clustering — never anything all-pairs, and
  * label state is one row per node. Per peel round: two keyed
  * semi-joins of the edge list against the survivor set plus a
  * map-side-combinable degree count; survivor frames are
  * localCheckpointed and freed round-over-round (the [[Bfs]]
  * discipline — peeling depth grows with data, unlike the fixed-K LPA
  * unroll, whose 4-round plan tree stays linear and cheaper without
  * per-round cuts).
  *
  * Determinism: plurality counts are exact integers and the argmax is
  * total-ordered by (count DESC, label ASC), so the label trajectory is
  * bit-identical across engines and partitionings — the property the
  * DuckDB unrolled-CTE oracle gates.
  */
object Communities {

  val LpaRounds = 4
  val CoreK = 2
  val PeelRounds = 4

  /** Synchronous LPA over an arbitrary undirected (part_a, part_b) pair
    * frame — the seam CommunitiesSpec drives with hand graphs. */
  private[graft] def communitiesOf(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst")))
      .localCheckpoint()
    var lab = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 1 to LpaRounds) {
      val cnt = edges.join(lab, edges("dst") === lab("node"))
        .select(edges("src").as("n"), col("lab"))
        .groupBy(col("n"), col("lab")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("n"))
        .orderBy(col("c").desc, col("lab").asc)
      lab = cnt.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("n").as("node"), col("lab"))
    }
    lab.select(col("node").as("part"), col("lab").as("community"))
  }

  /** Session-memoized LPA label frame — shared by the gate itself and
    * [[partsModularity]] (which would otherwise re-run the 4-round
    * unroll). Bounded: one (part, community) row per node. The
    * un-memoized [[communitiesOf]] seam is what CommunitiesSpec /
    * PlanSpec pin (the memoized gate's executed plan is a checkpoint
    * scan — same discipline as [[Basket.copurchase]]). */
  private[graft] def communityLabels(spark: SparkSession,
      sfDir: String): DataFrame =
    Frames.sessionMemo("lpa_labels", spark, sfDir) {
      communitiesOf(Basket.copurchase(spark, sfDir)
        .select(col("part_a"), col("part_b"))).localCheckpoint()
    }

  def partsCommunities(spark: SparkSession, sfDir: String): DataFrame =
    communityLabels(spark, sfDir)

  /** The LPA rounds as chained CTEs (pairs → edges → l0 → … → l_K);
    * ROW_NUMBER carries the identical (c DESC, lab ASC) total order.
    * Shared by the communities gate and the modularity oracle. */
  private[ext] val lpaCtes: String = {
    val rounds = (1 to LpaRounds).map { k =>
      s"""c$k AS (SELECT e.src AS n, l.lab, COUNT(*) AS c
         |  FROM edges e JOIN l${k - 1} l ON l.node = e.dst GROUP BY 1, 2),
         |l$k AS (SELECT n AS node, lab FROM (
         |    SELECT n, lab, ROW_NUMBER() OVER (
         |      PARTITION BY n ORDER BY c DESC, lab ASC) AS rk FROM c$k)
         |  WHERE rk = 1)""".stripMargin
    }
    s"""pairs AS (${Basket.copurchaseSql}),
       |edges AS (SELECT part_a AS src, part_b AS dst FROM pairs
       |          UNION ALL
       |          SELECT part_b, part_a FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  val partsCommunitiesSql: String =
    s"""WITH $lpaCtes
       |SELECT node AS part, lab AS community FROM l$LpaRounds""".stripMargin

  /** Newman modularity of the LPA partition, exactly: per community c,
    * q_num = 4·m·e_c − deg_c² (all exact Longs; m = undirected edge
    * count, e_c = intra-community edges, deg_c = summed degree), so
    * Q = Σ_c q_num / (4m²) — the exact-rational rendering of
    * Q = Σ_c [e_c/m − (deg_c/2m)²]. Per-row q_contrib is ONE IEEE
    * division of exact integers (bit-identical across engines); the
    * global Q aggregates the exact NUMERATORS first (Long sum), never
    * doubles, so no fold-order hazard exists anywhere.
    *
    * This is the standard partition-quality gate run after community
    * detection at scale (Newman 2006): a near-zero Q says the label
    * frame is noise, not structure. Magnitudes: m ≤ ~2e4 at sf0.1 ⇒
    * |q_num| ≤ max(4·m·e_c, deg_c²) ≤ (2m)² = 1.6e9, far inside Long;
    * doubles see integers < 2^53, so the one division is exact-input.
    *
    * Scale shape: rides the session-memoized pair graph + label frame;
    * two keyed equi-joins of pairs against labels (never all-pairs),
    * map-side-combinable community aggregates, and the 1-row m attached
    * by broadcast. */
  private[graft] def modularityOf(pairs: DataFrame,
      labels: DataFrame): DataFrame = {
    val deg = pairs.select(col("part_a").as("part"))
      .unionAll(pairs.select(col("part_b").as("part")))
      .groupBy(col("part")).agg(count(lit(1)).as("deg"))
    val m = pairs.agg(count(lit(1)).as("m"))
    val nodeAgg = labels.join(deg, "part")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val la = labels.select(col("part").as("pa"), col("community").as("ca"))
    val lb = labels.select(col("part").as("pb"), col("community").as("cb"))
    val eIn = pairs
      .join(la, col("part_a") === col("pa"))
      .join(lb, col("part_b") === col("pb"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
    nodeAgg.join(eIn, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"))
      .crossJoin(broadcast(m))
      .withColumn("q_num",
        lit(4L) * col("m") * col("e_in") - col("deg_sum") * col("deg_sum"))
      .withColumn("q_contrib",
        col("q_num").cast("double") /
          (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
      .select(col("community"), col("n_nodes"), col("e_in"),
        col("deg_sum"), col("q_num"), col("q_contrib"))
  }

  def partsModularity(spark: SparkSession, sfDir: String): DataFrame =
    modularityOf(
      Basket.copurchase(spark, sfDir).select(col("part_a"), col("part_b")),
      communityLabels(spark, sfDir))

  val partsModularitySql: String =
    s"""WITH $lpaCtes,
       |labels AS (SELECT node AS part, lab AS community FROM l$LpaRounds),
       |deg AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT part_a AS part FROM pairs
       |    UNION ALL SELECT part_b FROM pairs) GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
       |na AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(deg) AS BIGINT) AS deg_sum
       |  FROM labels JOIN deg USING (part) GROUP BY 1),
       |ei AS (SELECT la.community AS community,
       |    CAST(COUNT(*) AS BIGINT) AS e_in
       |  FROM pairs p
       |  JOIN labels la ON p.part_a = la.part
       |  JOIN labels lb ON p.part_b = lb.part
       |  WHERE la.community = lb.community GROUP BY 1)
       |SELECT na.community, na.n_nodes,
       |  CAST(COALESCE(ei.e_in, 0) AS BIGINT) AS e_in, na.deg_sum,
       |  4 * mm.m * CAST(COALESCE(ei.e_in, 0) AS BIGINT)
       |    - na.deg_sum * na.deg_sum AS q_num,
       |  CAST(4 * mm.m * CAST(COALESCE(ei.e_in, 0) AS BIGINT)
       |       - na.deg_sum * na.deg_sum AS DOUBLE)
       |    / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE))
       |      AS q_contrib
       |FROM na LEFT JOIN ei ON na.community = ei.community
       |CROSS JOIN mm""".stripMargin

  /** Fixed-round [[CoreK]]-core peel over an arbitrary undirected
    * (part_a, part_b) pair frame: survivors after [[PeelRounds]] rounds
    * with their degree at admission (their degree in the round's
    * surviving subgraph). */
  private[graft] def kcoreOf(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst")))
      .localCheckpoint()
    // Size-adaptive round partitioning ([[Frames.roundShuffleParts]],
    // where the r18 sf30 probe evidence lives): every per-round frame
    // here (sub, degree agg, survivor set) is bounded by the edge list,
    // whose size one cheap count on the fresh checkpoint gives.
    val edgeRows = edges.count()
    var nodes: DataFrame = null // null ⇒ round 1: survivors = all nodes
    var deg: DataFrame = null
    var prevDeg: DataFrame = null
    try {
      spark.conf.set("spark.sql.shuffle.partitions",
        Frames.roundShuffleParts(edgeRows, sessionParts))
      for (_ <- 1 to PeelRounds) {
        // Round 1's survivor set is every node, so filtering the edge
        // list against it is the identity — skip the two joins and
        // compute plain degree (the oracle's s1-over-n0 round is the
        // same identity, so results are unchanged; at scale this drops
        // 2 of the 8 edge-list joins).
        val sub =
          if (nodes == null) edges
          else edges
            .join(nodes.select(col("node").as("sa")), col("src") === col("sa"))
            .join(nodes.select(col("node").as("sb")), col("dst") === col("sb"))
        val d = sub.groupBy(col("src")).agg(count(lit(1)).as("c"))
          .localCheckpoint()
        prevDeg = deg
        deg = d
        val grown = deg.filter(col("c") >= CoreK)
          .select(col("src").as("node")).localCheckpoint()
        if (nodes != null) Frames.freeCheckpoint(nodes) // superseded by `grown`
        if (prevDeg != null) Frames.freeCheckpoint(prevDeg)
        nodes = grown
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions",
      sessionParts.toString)
    deg.filter(col("c") >= CoreK)
      .select(col("src").as("part"), col("c").as("core_deg"))
  }

  def partsKcore(spark: SparkSession, sfDir: String): DataFrame =
    kcoreOf(Basket.copurchase(spark, sfDir)
      .select(col("part_a"), col("part_b")))

  val partsKcoreSql: String = {
    val rounds = (1 to PeelRounds).map { k =>
      s"""s$k AS (SELECT e.src, e.dst FROM edges e
         |  JOIN n${k - 1} a ON e.src = a.node
         |  JOIN n${k - 1} b ON e.dst = b.node),
         |d$k AS (SELECT src, COUNT(*) AS c FROM s$k GROUP BY 1),
         |n$k AS (SELECT src AS node FROM d$k WHERE c >= $CoreK)""".stripMargin
    }
    s"""WITH pairs AS (${Basket.copurchaseSql}),
       |edges AS (SELECT part_a AS src, part_b AS dst FROM pairs
       |          UNION ALL
       |          SELECT part_b, part_a FROM pairs),
       |n0 AS (SELECT DISTINCT src AS node FROM edges),
       |${rounds.mkString(",\n")}
       |SELECT src AS part, CAST(c AS BIGINT) AS core_deg
       |FROM d$PeelRounds WHERE c >= $CoreK""".stripMargin
  }

  /** Degree assortativity (Newman 2002) of the co-purchase graph,
    * exactly: over the M = 2m directed renderings of the edge list with
    * endpoint degrees (j, k),
    * r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²) — the Pearson correlation
    * of degrees across edges, with every sum an exact Long (degrees
    * and M bound all terms ≪ 2^53) and ONE double division at the end.
    * Positive r = hubs link hubs (social shape); negative = hubs link
    * leaves (the catalog/star shape retail baskets produce). The
    * planted-hub probes ([[graft.GraphHubSpec]]) and this gate are the
    * same story: the metric says how hub-heavy the graph is, the probe
    * proves the operators survive it.
    *
    * Scale shape: one map-side-combinable degree count, two keyed
    * joins of the edge list against it (never all-pairs), one global
    * 1-row aggregate. The regular-graph degenerate case (r_den = 0) is
    * pinned to NULL in both engines (double 0/0 would be NaN in Spark
    * and NULL in DuckDB — the one place the engines' division
    * semantics diverge). */
  private[graft] def assortativityOf(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionAll(pairs.select(col("part_b").as("src"),
        col("part_a").as("dst")))
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("na"), col("deg").as("j")),
        col("src") === col("na"))
      .join(deg.select(col("node").as("nb"), col("deg").as("k")),
        col("dst") === col("nb"))
    withDeg.agg(
        (count(lit(1)) / 2).cast("long").as("m_edges"),
        count(lit(1)).as("m_directed"),
        sum(col("j") * col("k")).as("sum_jk"),
        sum(col("j")).as("sum_j"),
        sum(col("j") * col("j")).as("sum_j2"))
      .withColumn("r_num",
        col("m_directed") * col("sum_jk") - col("sum_j") * col("sum_j"))
      .withColumn("r_den",
        col("m_directed") * col("sum_j2") - col("sum_j") * col("sum_j"))
      .withColumn("assortativity",
        when(col("r_den") === 0L, lit(null).cast("double"))
          .otherwise(col("r_num").cast("double") /
            col("r_den").cast("double")))
  }

  def partsAssortativity(spark: SparkSession, sfDir: String): DataFrame =
    assortativityOf(Basket.copurchase(spark, sfDir)
      .select(col("part_a"), col("part_b")))

  val partsAssortativitySql: String =
    s"""WITH pairs AS (${Basket.copurchaseSql}),
       |edges AS (SELECT part_a AS src, part_b AS dst FROM pairs
       |          UNION ALL
       |          SELECT part_b, part_a FROM pairs),
       |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
       |  FROM edges GROUP BY 1),
       |s AS (SELECT
       |    CAST(COUNT(*) / 2 AS BIGINT) AS m_edges,
       |    CAST(COUNT(*) AS BIGINT) AS m_directed,
       |    CAST(SUM(a.deg * b.deg) AS BIGINT) AS sum_jk,
       |    CAST(SUM(a.deg) AS BIGINT) AS sum_j,
       |    CAST(SUM(a.deg * a.deg) AS BIGINT) AS sum_j2
       |  FROM edges e
       |  JOIN deg a ON e.src = a.node
       |  JOIN deg b ON e.dst = b.node)
       |SELECT m_edges, m_directed, sum_jk, sum_j, sum_j2,
       |  m_directed * sum_jk - sum_j * sum_j AS r_num,
       |  m_directed * sum_j2 - sum_j * sum_j AS r_den,
       |  CASE WHEN m_directed * sum_j2 - sum_j * sum_j = 0 THEN NULL
       |       ELSE CAST(m_directed * sum_jk - sum_j * sum_j AS DOUBLE)
       |         / CAST(m_directed * sum_j2 - sum_j * sum_j AS DOUBLE)
       |  END AS assortativity
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parts_communities" -> (partsCommunities _),
    "parts_kcore" -> (partsKcore _),
    "parts_modularity" -> (partsModularity _),
    "parts_assortativity" -> (partsAssortativity _))

  // MATERIALIZED CTEs on the unrolled-round oracles: each LPA/peel
  // round references the previous round's CTE twice, and DuckDB's
  // default inlining re-expands the chain exponentially — the sf1
  // audit measured a >75 GB spill for the k-core oracle vs 5 s
  // materialized (see Hashing.materializeCtes).
  val oracles: Map[String, String] = Map(
    "parts_communities" -> Hashing.materializeCtes(partsCommunitiesSql),
    "parts_kcore" -> Hashing.materializeCtes(partsKcoreSql),
    "parts_modularity" -> Hashing.materializeCtes(partsModularitySql),
    "parts_assortativity" -> partsAssortativitySql)
}
