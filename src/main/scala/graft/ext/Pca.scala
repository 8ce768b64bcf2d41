package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of the embedding cloud by EXACT-integer
  * power iteration — the direction a whitening / compression /
  * drift-monitoring pass cares about most, computed without a single
  * engine-dependent float until the terminal Rayleigh ratio.
  *
  * Linear algebra with cleared denominators: the mean-centered scatter
  * matrix is n²·Cov = n·Σqqᵀ − (Σq)(Σq)ᵀ — exact Longs on the
  * [[Similarity]] 10⁴-quantized vectors, with Σqqᵀ the already-gated
  * [[Similarity.gramOf]] fold. Three power-iteration rounds then run
  * entirely in scaled-Long arithmetic: matrix and iterate are each
  * renormalized by DIVIDING by max(1, max|·| div 10⁶) — the divide-by
  * form keeps every product inside a Long (a multiply-by-scale form
  * overflows at the matrix magnitudes), and integer division truncates
  * toward zero IDENTICALLY in Spark (`div`, JVM semantics) and DuckDB
  * (`//`, verified −7//2 = −3), so the whole trajectory — signs
  * included — is bit-identical across engines. PcaSpec pins the
  * truncation-parity assumption executable.
  *
  * The d×d matrix frames are constant-size (d = 64) at ANY corpus
  * scale; the only data-proportional work is the gram fold and the
  * per-dim sums, both map-side-combinable single-scan aggregates. The
  * iteration is a handful of keyed joins over d- and d²-row frames —
  * driver-coordination-free, unrolled in one plan like [[PageRank]].
  * Rayleigh quotient vᵀC'v / vᵀv emits exact decimal/HUGEINT
  * numerator (the one term past Long range) cast to double, beside the
  * exact Long loadings. */
object Pca {

  val Iters = 3
  val Scale = 1000000L

  def topComponent(spark: SparkSession, sfDir: String): DataFrame =
    topComponentOf(Similarity.quantized(spark, sfDir))

  /** The iteration over any frame with a `qv: array<long>` column —
    * the seam PcaSpec drives with planted anisotropic clouds. */
  private[graft] def topComponentOf(qIn: DataFrame): DataFrame = {
    val q = qIn.localCheckpoint()
    val dims = q.select(posexplode(col("qv")).as(Seq("dim", "qx")))
    val sums = dims.groupBy(col("dim")).agg(sum(col("qx")).as("s"))
      .localCheckpoint() // joined twice into the scatter build
    val nRow = q.agg(count(lit(1)).as("n"))
    val gUp = Similarity.gramOf(q) // (dim_i, dim_j >= dim_i, sum_prod)
    val gFull = gUp.unionAll(
      gUp.filter(col("dim_i") < col("dim_j"))
        .select(col("dim_j").as("dim_i"), col("dim_i").as("dim_j"),
          col("sum_prod")))
    val cNum = gFull
      .join(sums.select(col("dim").as("dim_i"), col("s").as("si")), "dim_i")
      .join(sums.select(col("dim").as("dim_j"), col("s").as("sj")), "dim_j")
      .crossJoin(broadcast(nRow))
      .select(col("dim_i"), col("dim_j"),
        (col("n") * col("sum_prod") - col("si") * col("sj")).as("cn"))
    val cPrime = cNum
      .crossJoin(broadcast(cNum.agg(max(abs(col("cn"))).as("cm"))))
      .select(col("dim_i"), col("dim_j"),
        expr(s"cn div greatest(1L, cm div ${Scale}L)").as("cv"))
      .localCheckpoint() // consumed by every iteration round
    var v = sums.select(col("dim").as("j"), lit(Scale).as("v"))
    for (_ <- 1 to Iters) {
      val w = cPrime.join(v, cPrime("dim_j") === v("j"))
        .groupBy(col("dim_i"))
        .agg(sum(col("cv") * col("v")).as("w"))
      v = w.crossJoin(broadcast(w.agg(max(abs(col("w"))).as("wm"))))
        .select(col("dim_i").as("j"),
          expr(s"w div greatest(1L, wm div ${Scale}L)").as("v"))
    }
    val vFinal = v.localCheckpoint() // joined into w4 AND the output
    val w4 = cPrime.join(vFinal, cPrime("dim_j") === vFinal("j"))
      .groupBy(col("dim_i"))
      .agg(sum(col("cv") * col("v")).as("w"))
    val ray = w4.join(vFinal, w4("dim_i") === vFinal("j"))
      .agg(
        sum(col("v").cast("decimal(38,0)") * col("w").cast("decimal(38,0)"))
          .cast("double").as("ray_num"),
        sum(col("v") * col("v")).as("ray_den"))
    vFinal.crossJoin(broadcast(ray))
      .select(col("j").as("dim"), col("v").as("loading"),
        col("ray_num"), col("ray_den"),
        (col("ray_num") / col("ray_den").cast("double")).as("rayleigh"))
  }

  val topComponentSql: String = {
    val S = Scale
    val steps = (1 to Iters).map { k =>
      s"""w$k AS (SELECT cp.dim_i AS dim, CAST(SUM(cp.cv * v${k - 1}.v)
         |    AS BIGINT) AS w
         |  FROM cp JOIN v${k - 1} ON cp.dim_j = v${k - 1}.j GROUP BY 1),
         |v$k AS (SELECT dim AS j, CAST(w // greatest(1,
         |    (SELECT MAX(abs(w)) FROM w$k) // $S) AS BIGINT) AS v
         |  FROM w$k)""".stripMargin
    }
    s"""WITH ${Similarity.quantizedSqlCte},
       |u AS (SELECT vec_id, unnest(qv) AS q,
       |        CAST(unnest(generate_series(1, len(qv))) - 1 AS BIGINT) AS dim
       |      FROM e),
       |g AS (SELECT a.dim AS dim_i, b.dim AS dim_j,
       |    CAST(SUM(a.q * b.q) AS BIGINT) AS sum_prod
       |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.dim >= a.dim
       |  GROUP BY 1, 2),
       |gf AS (SELECT dim_i, dim_j, sum_prod FROM g
       |  UNION ALL
       |  SELECT dim_j, dim_i, sum_prod FROM g WHERE dim_i < dim_j),
       |s AS (SELECT dim, CAST(SUM(q) AS BIGINT) AS sv FROM u GROUP BY 1),
       |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
       |c AS (SELECT gf.dim_i, gf.dim_j,
       |    t.n * gf.sum_prod - si.sv * sj.sv AS cn
       |  FROM gf JOIN s si ON gf.dim_i = si.dim
       |          JOIN s sj ON gf.dim_j = sj.dim, cnt t),
       |cp AS (SELECT dim_i, dim_j, CAST(cn // greatest(1,
       |    (SELECT MAX(abs(cn)) FROM c) // $S) AS BIGINT) AS cv FROM c),
       |v0 AS (SELECT dim AS j, CAST($S AS BIGINT) AS v FROM s),
       |${steps.mkString(",\n")},
       |w4 AS (SELECT cp.dim_i AS dim, CAST(SUM(cp.cv * v$Iters.v) AS BIGINT)
       |    AS w
       |  FROM cp JOIN v$Iters ON cp.dim_j = v$Iters.j GROUP BY 1),
       |ray AS (SELECT
       |    CAST(SUM(CAST(v.v AS HUGEINT) * w4.w) AS DOUBLE) AS ray_num,
       |    CAST(SUM(v.v * v.v) AS BIGINT) AS ray_den
       |  FROM w4 JOIN v$Iters v ON w4.dim = v.j)
       |SELECT v.j AS dim, v.v AS loading, r.ray_num, r.ray_den,
       |  r.ray_num / CAST(r.ray_den AS DOUBLE) AS rayleigh
       |FROM v$Iters v, ray r""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_top_component" -> (topComponent _))

  val oracles: Map[String, String] = Map(
    // Unrolled power-iteration chain: each wk/vk references its
    // predecessor plus the shared gram CTE — materialized so the oracle
    // engine computes each step once instead of re-expanding the whole
    // prefix (sf3: ORACLE-TIMEOUT → OOM even on a fat child otherwise).
    "embedding_top_component" -> Hashing.materializeCtes(topComponentSql))
}
