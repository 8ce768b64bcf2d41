package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Character-distribution quality signals — the cheapest filters in a
  * curation stack (run before anything tokenizes): Shannon entropy of
  * the per-doc character histogram (gibberish and base64 blobs sit far
  * above prose; repeated-char junk far below) and the Simpson diversity
  * / effective-alphabet size (the no-log twin). Both appear in the
  * Gopher/C4-style rule stacks next to the length and stopword gates
  * ([[Quality]]).
  *
  * Exactness: Shannon entropy needs log2, and libm `log` is not
  * correctly rounded — the one function family this codebase never lets
  * near a gate. Instead, log2 is taken at CENTIBIT precision from an
  * exact integer table: L(k) = ⌊100·log2 k⌋ = bitLength(k¹⁰⁰) − 1,
  * computed once in BigInt (pure integer math, any engine replays it)
  * and embedded as the SAME literal table in the Spark plan (a
  * [[TabMax]]-row LocalRelation broadcast) and the oracle SQL (a list
  * literal) — single Scala source of truth for both renditions. Per-doc
  * entropy is then the all-integer
  *
  *   H_cb = (n·L(n) − Σ_c cnt_c·L(cnt_c)) div n    [centibits/char]
  *
  * (identity: H = log2 n − (1/n)·Σ cnt·log2 cnt), bit-identical across
  * engines by construction. Simpson needs no logs at all:
  * `1000 − 1000·Σcnt² div n²` and the inverse `n² div Σcnt²` (effective
  * alphabet size) are exact Longs.
  *
  * Scale shape: ONE compiled pass per doc builds the character
  * histogram ([[graft.functions.HashKernels.charCounts]] — counts
  * only, the math is symmetric in the characters), exploding
  * ~|alphabet| count rows per doc instead of one row per corpus
  * CHARACTER (round 14: the original `regexp_extract_all` + explode +
  * (doc, char) groupBy paid a regex match and an exploded row per
  * character — ~700M rows and an extra exchange at sf10 — for rows
  * whose char column the query then DROPPED). Then two CONSTANT-size
  * broadcast joins against the log table and one per-doc agg. The
  * table is sized to the max doc length ([[TabMax]] = 2048 covers the
  * fixture's 577-char max 3.5×; a corpus of million-char docs ships a
  * 2^20-row table — still a constant-size broadcast, the dial is
  * memory-free). The DuckDB oracle keeps the per-character
  * formulation, so the gate hash pins the kernel's equivalence.
  */
object CharEntropy {

  /** Table bound: counts and doc lengths must be < TabMax. */
  private val TabMax = 2048

  /** ⌊100·log2 k⌋ exactly: bitLength(k^100) − 1. No floating point. */
  private[graft] def log2Centibits(k: Int): Long =
    BigInt(k).pow(100).bitLength - 1L

  private lazy val table: IndexedSeq[(Long, Long)] =
    (1 until TabMax).map(k => (k.toLong, log2Centibits(k)))

  /** Per-doc char-quality frame over any (doc_id, text) frame. */
  private[graft] def entropyOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tab = table.toDF("k", "lb")
    // TabMax guard (round-15 advisory): a doc of length >= TabMax would
    // silently VANISH at the inner lookup joins below (its n — and
    // possibly a char count — has no table row). Fail loudly instead:
    // assert_true sits inside a filter so column pruning cannot drop it,
    // and length() is codegen'd row-local work on a scan we do anyway.
    val guarded = docs.filter(
      assert_true(length(col("text")) < lit(TabMax),
        lit(s"CharEntropy: doc length >= TabMax ($TabMax); " +
          "raise TabMax for this corpus")).isNull)
    val counts = guarded
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.charCounts(col("text")))
          .as("cnt"))
    counts
      .join(broadcast(tab), col("cnt") === col("k"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("lb")).as("sum_clb"),
        sum(col("cnt") * col("cnt")).as("sum_c2"))
      .join(broadcast(tab.select(col("k").as("nk"), col("lb").as("ln"))),
        col("n") === col("nk"))
      .select(col("doc_id"), col("n"), col("n_distinct"),
        expr("(n * ln - sum_clb) div n").as("entropy_cb"),
        expr("1000 - (1000 * sum_c2) div (n * n)").as("simpson_pm"),
        expr("(n * n) div sum_c2").as("eff_chars"))
  }

  def entropy(spark: SparkSession, sfDir: String): DataFrame =
    entropyOf(Tables.documents(spark, sfDir))

  val entropySql: String = {
    val ks = table.map(_._1).mkString(",")
    val lbs = table.map(_._2).mkString(",")
    s"""WITH lt AS (SELECT unnest([$ks]) AS k, unnest([$lbs]) AS lb),
       |cc AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
       |  FROM documents),
       |cnts AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM cc GROUP BY doc_id, ch),
       |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |  CAST(SUM(cnt * lt.lb) AS BIGINT) AS sum_clb,
       |  CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2
       |  FROM cnts JOIN lt ON cnts.cnt = lt.k GROUP BY doc_id)
       |SELECT doc_id, n, n_distinct,
       |  (n * lt.lb - sum_clb) // n AS entropy_cb,
       |  1000 - (1000 * sum_c2) // (n * n) AS simpson_pm,
       |  (n * n) // sum_c2 AS eff_chars
       |FROM agg JOIN lt ON agg.n = lt.k""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_char_entropy" -> (entropy _))

  val oracles: Map[String, String] = Map(
    "quality_char_entropy" -> entropySql)
}
