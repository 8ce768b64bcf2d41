package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Hashing._

/** Deduplication kit for a training-data pipeline:
  *
  *  - exact (content-hash groupBy),
  *  - fingerprint (normalized-text hash, keep min doc_id),
  *  - SimHash (per-doc 31-bit signature),
  *  - MinHash + LSH banding (candidate pairs → exact-Jaccard verify),
  *  - n-gram Jaccard (exact, on a deterministic query sample),
  *  - embedding-cosine near-dup (exact integer-quantized cosine).
  *
  * Scale design: every pipeline is shuffle-bounded by keys (hash, band
  * bucket), never all-pairs. The only all-pairs work is (a) inside an LSH
  * bucket — candidates that already share a band — and (b) the explicitly
  * sampled exact-Jaccard baseline. At 100 TB: the explode(shingle) →
  * groupBy(doc) signature computation is a single map-side-combinable
  * aggregation; band buckets shuffle-partition the near-dup search.
  *
  * Determinism: all hashes are the exact integer folds of
  * [[graft.ext.Hashing]], mirrored in the DuckDB oracles.
  */
object Dedup {

  /** Exact dedup: group by content hash. All-singleton on the synthetic
    * corpus, but the pipeline is the production one. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  val exactSql: String =
    "SELECT md5(text) AS h, COUNT(*) AS cnt, MIN(doc_id) AS keeper " +
      "FROM documents GROUP BY md5(text)"

  /** Fingerprint dedup: normalized text (lowercase, collapsed whitespace)
    * hashed; survivors = min doc_id per fingerprint. */
  def fingerprintDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(graft.functions.GraftFunctions.normalizeWs(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("cnt"))

  val fingerprintDedupSql: String =
    """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
      |  MIN(doc_id) AS keeper, COUNT(*) AS cnt
      |FROM documents GROUP BY 1""".stripMargin

  /** Per-doc 31-bit SimHash over word hashes: bit i of the signature is
    * the sign of sum_w (2*bit_i(h(w)) - 1). One codegen'd pass per row —
    * no shuffle at all. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash(wordHashes(col("text")))
          .as("simhash"))

  val simhashSql: String =
    s"""SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, 31), i ->
       |    CASE WHEN list_sum(list_prepend(0::BIGINT,
       |                 list_transform(whs, w -> ((w >> i) & 1) * 2 - 1))) > 0
       |         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
       |FROM (SELECT doc_id, ${wordHashesSql("text")} AS whs FROM documents)""".stripMargin

  // ------------------------------------------------ SimHash hamming radius

  /** Hamming search radius for [[simhashHamming]] — Manku/Jain/Sarma's
    * production setting (WWW'07 §3: 64-bit simhash, k = 3). */
  val HammingRadius = 3

  /** 62-bit SimHash: the two independent word-hash families (char folds
    * base 31 and base 37 — the same pair the widened span hash of
    * [[Substring]] is built from) each yield a 31-bit sign-sum
    * signature, packed as `sa + sb·2^31`. The 31-bit single-family
    * signature of [[simhash]] is too coarse for RADIUS search on a
    * corpus that shares one small vocabulary (measured here: a third of
    * all doc pairs sit within hamming 3 of each other at 31 bits; at 62
    * bits radius 3 keeps 1 pair in ~350 at sf0.01) — which is exactly
    * why the published detector is 64-bit, not 32. Still one codegen'd
    * pass per row, no shuffle. */
  def simhash62(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (graft.functions.GraftFunctions.simhash(wordHashes(col("text"))) +
          shiftleft(graft.functions.GraftFunctions.simhash(
            wordHashes37(col("text"))), 31)).as("simhash"))

  val simhash62Sql: String = {
    def signSum(whsCol: String) =
      s"""CAST(list_sum(list_transform(range(0, 31), i ->
         |    CASE WHEN list_sum(list_prepend(0::BIGINT,
         |                 list_transform($whsCol, w -> ((w >> i) & 1) * 2 - 1))) > 0
         |         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin
    s"""SELECT doc_id, ${signSum("wa")} + (${signSum("wb")} << 31) AS simhash
       |FROM (SELECT doc_id, ${wordHashesSql("text")} AS wa,
       |             ${wordHashes37Sql("text")} AS wb FROM documents)""".stripMargin
  }

  /** The four pigeonhole band keys of a 62-bit signature column. Any
    * two signatures within hamming distance [[HammingRadius]] = 3 agree
    * EXACTLY on at least one of 4 disjoint bands, so a band equi-join
    * finds every such pair — recall 1 by pigeonhole, which the oracle
    * PROVES by brute-forcing all pairs with no banding at all.
    *
    * Band composition is entropy-paired, and measured, not guessed: a
    * sign-sum simhash's HIGH bits are corpus-correlated (the shared
    * vocabulary pushes the same sign on the same high bit in every
    * document), so contiguous bands put all the low-entropy bits in one
    * key — measured 2.5M candidate pairs per high band at sf0.1 —
    * while pairing each family's high bits with the OTHER family's
    * high-entropy low bits spreads every band below 0.62M (3× fewer
    * candidates overall). Each band covers each of the 62 bits exactly
    * once: (A0-7,B24-30), (A8-15,B16-23), (B0-7,A24-30), (B8-15,A16-23). */
  private[ext] def simhashBandKeys(sim: Column): Column = array(
    sim.bitwiseAND(255L) + shiftleft(shiftright(sim, 55).bitwiseAND(127L), 8),
    shiftright(sim, 8).bitwiseAND(255L) +
      shiftleft(shiftright(sim, 47).bitwiseAND(255L), 8),
    shiftright(sim, 31).bitwiseAND(255L) +
      shiftleft(shiftright(sim, 24).bitwiseAND(127L), 8),
    shiftright(sim, 39).bitwiseAND(255L) +
      shiftleft(shiftright(sim, 16).bitwiseAND(255L), 8))

  /** All document pairs within hamming distance ≤ [[HammingRadius]] of
    * each other's [[simhash62]] signature — the Manku near-dup detector
    * as a banded self-join: explode each signature into its 4 band
    * keys, equi-join on (band, key), verify with an exact
    * `bit_count(xor)`, distinct the multi-band collisions. Shuffles:
    * the band self-join (keyed on the band value) and the distinct —
    * never all-pairs; the oracle is the all-pairs brute force, so
    * hash-equality IS the pigeonhole recall proof. */
  def simhashHamming(spark: SparkSession, sfDir: String): DataFrame =
    hammingPairsOf(simhash62(spark, sfDir))

  /** The banded radius search over an arbitrary (doc_id, simhash) frame
    * — the seam DedupSpec drives with hand-planted signatures. */
  private[graft] def hammingPairsOf(sig: DataFrame): DataFrame = {
    val banded = sig
      .select(col("doc_id"), col("simhash"),
        posexplode(simhashBandKeys(col("simhash"))))
      .toDF("doc_id", "simhash", "band", "bv")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("cast(bit_count(x.simhash ^ y.simhash) as bigint)").as("dist"))
      .filter(col("dist") <= HammingRadius)
      .distinct()
  }

  /** Brute force, no banding: equality proves the banded plan's recall. */
  val simhashHammingSql: String =
    s"""WITH sig AS ($simhash62Sql)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS dist
       |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $HammingRadius""".stripMargin

  /** Sorted-neighborhood window: pairs within rank distance < W. */
  val SnmWindow = 4

  /** Sorted-neighborhood dedup (Hernández/Stolfo 1995 — the classic
    * record-linkage alternative to LSH banding): sort the corpus by a
    * similarity-clustering key (the [[simhash62]] signature — near-dup
    * docs sort adjacently because their signatures share high bits),
    * then compare only records within a sliding window of [[SnmWindow]]
    * positions, verifying with the exact hamming distance. LSH banding
    * is recall-1 at its radius but needs one join per band table; SNM
    * is the single-sort heuristic a pipeline runs when it wants ONE
    * linear pass with a hard candidate bound of W−1 pairs per record —
    * the recall trade is measured in DedupSpec against the banded
    * truth, not claimed.
    *
    * Scale shape — no global window anywhere: the global sort rank is
    * the chunked packer's distributed prefix sum (repartitionByRange on
    * the sort key, per-partition row_number + a broadcast #partitions-row
    * offset table — partition-count-invariant by construction). Window
    * pairs then materialize through a BUCKET equi-join: each row lands
    * in buckets floor(rnk/W) and floor(rnk/W)+1, so any pair with rank
    * gap < W shares ≥ 1 bucket (adjacent-bucket pigeonhole), the join
    * stays keyed, and per-bucket fan-out is ≤ 2W rows. The DuckDB
    * oracle takes the opposite plan — one flat row_number + a rank
    * BETWEEN self-join — so the gate proves the distributed rank and
    * the bucket pigeonhole against the naive formulation. */
  def sortedNeighborhood(spark: SparkSession, sfDir: String): DataFrame =
    snmPairsOf(simhash62(spark, sfDir))

  /** The SNM pipeline over an arbitrary (doc_id, simhash) frame — the
    * seam DedupSpec drives with hand signatures. */
  private[graft] def snmPairsOf(sig: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = SnmWindow
    val sorted = sig.repartitionByRange(col("simhash"), col("doc_id"))
      .sortWithinPartitions(col("simhash"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // #partitions-row offset table (broadcast); the only ordered window
    // in the plan runs over it, never over data.
    val partOffsets = sorted.groupBy(col("pid"))
      .agg(count(lit(1)).as("pn"))
      .select(col("pid"),
        coalesce(sum(col("pn")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("poff"))
    val localWin = Window.partitionBy(col("pid"))
      .orderBy(col("simhash"), col("doc_id"))
    val ranked = sorted.join(broadcast(partOffsets), "pid")
      .withColumn("rnk",
        (col("poff") + row_number().over(localWin) - 1).cast("long"))
      .select(col("doc_id"), col("simhash"), col("rnk"))
    val buckets = ranked.select(col("doc_id"), col("simhash"), col("rnk"),
      explode(array(expr(s"rnk div ${w}L"),
        expr(s"rnk div ${w}L + 1"))).as("bk"))
    buckets.as("x").join(buckets.as("y"),
        col("x.bk") === col("y.bk") &&
          col("y.rnk").between(col("x.rnk") + 1, col("x.rnk") + (w - 1)))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("cast(bit_count(x.simhash ^ y.simhash) as bigint)").as("dist"),
        (col("y.rnk") - col("x.rnk")).as("gap"))
      .filter(col("dist") <= HammingRadius)
      .distinct()
  }

  /** Naive plan: one flat rank, one BETWEEN self-join. */
  val sortedNeighborhoodSql: String =
    s"""WITH sig AS ($simhash62Sql),
       |r AS (SELECT doc_id, simhash,
       |    CAST(row_number() OVER (ORDER BY simhash, doc_id) - 1 AS BIGINT)
       |      AS rnk
       |  FROM sig)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist,
       |  b.rnk - a.rnk AS gap
       |FROM r a JOIN r b
       |  ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + ${SnmWindow - 1}
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingRadius""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** (doc_id, sh: array<long>) — distinct 3-word-shingle hashes. Shared
    * with the cross-snapshot verifier ([[Incremental]]). */
  private[ext] def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        shingleHashes(wordHashes(col("text")), 3).as("sh"))

  private val bandsOf = 4 // 16 perms → 4 bands × 4 rows

  /** MinHash signatures, one codegen'd pass per doc — NO shuffle at all
    * (the round-1 explode + groupBy + 16×min formulation is semantically
    * identical but shuffled one row per doc; this computes the same 16
    * mins inline). Docs with zero shingles are dropped, matching the
    * explode path. */
  private[ext] def sigsOf(sh: DataFrame): DataFrame =
    sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(col("sh")).as("sig"))

  def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    sigsOf(shingled(spark, sfDir))

  /** (doc_id, band, bh) — the LSH band-bucket table from a `(doc_id, sh)`
    * frame. This IS the dedup state a snapshot persists: [[Incremental]]
    * joins a new batch's buckets against a prior snapshot's copy of this
    * frame. */
  private[ext] def bucketsOf(sh: DataFrame): DataFrame =
    sigsOf(sh)
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.minhashBands(col("sig"), bandsOf)))
      .toDF("doc_id", "band", "bh")

  private[ext] def bandBuckets(spark: SparkSession, sfDir: String): DataFrame =
    bucketsOf(shingled(spark, sfDir))

  /** LSH band-bucket candidate pairs (doc_a < doc_b) — the shared
    * candidate stage both near-dup verifiers (Jaccard, edit distance)
    * refine. */
  def lshCandidates(spark: SparkSession, sfDir: String): DataFrame =
    pairsOf(bandBuckets(spark, sfDir))

  private def pairsOf(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** Per-band-bucket membership cap for the candidate self-join — the
    * posting-cap pattern ([[Basket]]'s copurchase cap, the sparse-doc
    * postings cap) applied to LSH buckets. An UNCAPPED band self-join is
    * quadratic in the occupancy of its largest bucket, and real corpora
    * have mega-buckets (templated boilerplate, near-identical spam
    * clusters); at 100 TB one such cluster of 10⁶ docs is 5·10¹¹ pairs
    * in a single reduce key — the job-killer shape. Capping each
    * (band, bh) bucket to its first [[BucketCap]] members in the
    * deterministic (idHash, doc_id) order bounds any bucket's
    * contribution at K²/2 pairs while keeping the GROUPS discoverable:
    * a near-dup cluster's survivors still pair with each other (the
    * transitive-closure consumer reconnects the rest), which is why
    * strongest-K-per-bucket is the standard production trade. The cap is
    * replicated VERBATIM in the oracle (same window, same order), so the
    * gate stays hash-exact at every SF; at the gate SFs it never binds —
    * max measured occupancy is 4 at sf0.1 / 18 at sf3 vs K=32 — which
    * CappedBucketsSpec proves by equating capped and uncapped results
    * (and proves the cap ENGAGES on a planted mega-bucket). */
  private[graft] val BucketCap = 32

  private[graft] def cappedBuckets(bands: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("band"), col("bh"))
      .orderBy(Hashing.idHash(col("doc_id")), col("doc_id"))
    bands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= BucketCap).drop("rn")
  }

  /** [[lshCandidates]] with the [[BucketCap]] guard — the candidate
    * stage the edit-distance verifier rides (its per-pair cost is the
    * highest of the verifiers, so it is the first consumer to get the
    * bound; the same wrapper serves any other consumer that needs it). */
  def lshCandidatesCapped(spark: SparkSession, sfDir: String): DataFrame =
    pairsOf(cappedBuckets(bandBuckets(spark, sfDir)))

  /** MinHash-LSH near-dup pairs: band-bucket join for candidates, then
    * exact shingle-Jaccard verification at 0.8. The only shuffles are the
    * band self-join and the two verify joins — all keyed, no all-pairs. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    verifyJaccard(spark, sfDir, lshCandidates(spark, sfDir), threshold = 0.8)

  /** [[minhashLsh]] over the [[BucketCap]]-capped candidate stage — the
    * bounded-intermediates tier [[DedupBounded]] composes (same verify,
    * same threshold; only the candidate generation is capped). */
  private[ext] def minhashLshCapped(spark: SparkSession, sfDir: String): DataFrame =
    verifyJaccard(spark, sfDir, lshCandidatesCapped(spark, sfDir), threshold = 0.8)

  /** Edit-distance near-dup verification over the SAME LSH candidates
    * (capped at [[BucketCap]] per band bucket — Levenshtein is the most
    * expensive verifier per pair, O(|a|·|b|) chars, so it is the one a
    * mega-bucket hurts first): exact Levenshtein ≤ 20 on the raw texts —
    * the character-level twin of the shingle-Jaccard verifier (identical
    * algorithm in both engines, so directly oracle-comparable). Quadratic
    * per pair, which is fine precisely because LSH + the cap bound the
    * candidate count. */
  def editDistanceDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // Thresholded Levenshtein (banded DP, O((|a|+|b|)·d) instead of
    // O(|a|·|b|)): the filter only keeps dist ≤ 20, and the threshold
    // overload returns the EXACT distance for every pair within the
    // band (−1 beyond it, which the filter drops), so results are
    // byte-identical to the unbounded form at ~1/100 the per-pair cost
    // on kilobyte docs — the dominant cost of this key once the heaps
    // generator's near-dup density raises the candidate count (pairs
    // grow ~6× per 3× in the sub-cap buckets; the per-pair bound is
    // what keeps the KEY's wall clock near-linear). The oracle keeps
    // the unbounded two-argument form — same values, engine-local cost.
    lshCandidatesCapped(spark, sfDir)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), 20).cast("long").as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Join candidate pairs back to shingle sets; exact Jaccard via the
    * two-pointer sorted-set intersect kernel. */
  private def verifyJaccard(spark: SparkSession, sfDir: String,
      cands: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(spark, sfDir)
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    val uni = size(col("sha")).cast("long") + size(col("shb")).cast("long") - inter
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / uni.cast("double")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  private[ext] def shingledSqlCte: String =
    s"""sh0 AS (SELECT doc_id, ${wordHashesSql("text")} AS whs FROM documents),
       |sh AS (SELECT doc_id, ${shingleHashesSql("whs", 3)} AS sh FROM sh0)""".stripMargin

  /** Shared CTE chain (shingles → sigs → bands), used by the Jaccard and
    * edit-distance oracles here and the cross-snapshot oracles in
    * [[Incremental]]. Exposes CTEs `sh` (doc_id, sh) and `bands`
    * (doc_id, band, bh). */
  private[ext] lazy val bandsSqlCtes: String = {
    val minCols = (0 until NumPerms)
      .map(i => s"MIN((${permA(i)}*h + ${permB(i)}) % $P) AS s${i}").mkString(",\n    ")
    val bandRows = (0 until bandsOf).map { b =>
      val fold = (0 until NumPerms / bandsOf)
        .map(r => s"s${b * (NumPerms / bandsOf) + r}")
        .foldLeft("0::BIGINT")((acc, s) => s"(($acc)*31 + $s) % $P")
      s"SELECT doc_id, $b AS band, $fold AS bh FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""$shingledSqlCte,
       |sigs AS (
       |  SELECT doc_id, $minCols
       |  FROM (SELECT doc_id, unnest(sh) AS h FROM sh) GROUP BY doc_id),
       |bands AS (
       |  $bandRows)""".stripMargin
  }

  /** [[bandsSqlCtes]] plus the self-join candidate CTE `cands`. */
  private lazy val lshCandsSqlCtes: String =
    s"""$bandsSqlCtes,
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)""".stripMargin

  /** [[bandsSqlCtes]] plus the CAPPED candidate CTE — the verbatim
    * oracle twin of [[cappedBuckets]]: same window, same (idHash,
    * doc_id) order, same K. */
  private[ext] lazy val cappedCandsSqlCtes: String =
    s"""$bandsSqlCtes,
       |capped AS (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, row_number() OVER (
       |      PARTITION BY band, bh
       |      ORDER BY ${idHashSql("doc_id")}, doc_id) AS rn
       |    FROM bands) WHERE rn <= $BucketCap),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)""".stripMargin

  val editDistanceDedupSql: String =
    s"""WITH $cappedCandsSqlCtes
       |SELECT doc_a, doc_b, CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
       |FROM cands JOIN documents a ON a.doc_id = doc_a
       |JOIN documents b ON b.doc_id = doc_b
       |WHERE levenshtein(a.text, b.text) <= 20""".stripMargin

  val minhashLshSql: String = {
    s"""WITH $lshCandsSqlCtes
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jac
       |FROM cands JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.8""".stripMargin
  }

  /** Docs in the fixed n-gram-Jaccard audit sample: CONSTANT at any SF
    * so the broadcast query side stays bounded (a `% k` sample grows
    * with the corpus and eventually kills the broadcast). */
  private val JaccardSampleN = 32

  /** Exact n-gram Jaccard baseline on a fixed 32-doc query sample (the
    * 32 smallest idHash(doc_id)) against the full corpus — the ground
    * truth the LSH path approximates. Deliberately not all-pairs: the
    * constant-size sample bounds the quadratic term; at 100 TB this is
    * the audit query, not the dedup. */
  def ngramJaccardSample(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingled(spark, sfDir)
    val q = sh
      .orderBy(Hashing.idHash(col("doc_id")), col("doc_id"))
      .limit(JaccardSampleN)
      .select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    val uni = size(col("sha")).cast("long") + size(col("shb")).cast("long") - inter
    broadcast(q)
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / uni.cast("double")).as("jac"))
      .filter(col("jac") >= 0.3)
  }

  val ngramJaccardSampleSql: String =
    s"""WITH $shingledSqlCte,
       |qd AS (SELECT doc_id, sh FROM sh
       |  ORDER BY ${Hashing.idHashSql("doc_id")}, doc_id LIMIT $JaccardSampleN)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jac
       |FROM qd a JOIN sh b ON a.doc_id <> b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.3""".stripMargin

  /** Embedding-cosine near-dup pairs over integer-quantized vectors (see
    * Similarity for the quantization rationale). The fixed 64-vector
    * query sample keeps the pair count — and the broadcast — bounded at
    * any SF. */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosinePairs(spark, sfDir, querySampleN = 64)
      .filter(col("cos") >= 0.45)
      .select(col("vec_a"), col("vec_b"), col("cos"))

  val embeddingNearDupSql: String =
    s"""SELECT vec_a, vec_b, cos FROM (${Similarity.cosinePairsSql(64)})
       |WHERE cos >= 0.45""".stripMargin

  // ------------------------------------------------------ LSH calibration

  /** Calibration sample size: constant at any SF (idHash order), big
    * enough that the corpus's near-dup pairs land inside it. */
  private val CalibN = 192

  /** The measured MinHash-LSH S-curve — the tuning artifact behind every
    * banding choice: over a fixed sample of document pairs, exact
    * shingle-Jaccard (as an integer decile) × did-the-bands-collide,
    * counted. Reading it answers the two questions a banding config must
    * answer empirically: do high-Jaccard pairs band-collide (recall),
    * and how many unrelated pairs collide anyway (the false-candidate
    * load the verify join must absorb).
    *
    * Scale shape: the sample is constant-size in idHash order (the
    * decontam/audit invariant), so the all-pairs term is a constant
    * broadcast nested loop (~CalibN²/2 pairs) regardless of corpus size;
    * the band-collision flag joins the same bounded pair set against the
    * sample's band rows. Nothing corpus-sized is ever pairwise. */
  def lshCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingled(spark, sfDir).filter(size(col("sh")) > 0)
    val samp = sh.orderBy(Hashing.idHash(col("doc_id")), col("doc_id"))
      .limit(CalibN)
    val pairs = samp.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
      .join(broadcast(samp.select(col("doc_id").as("doc_b"),
        col("sh").as("shb"))), col("doc_a") < col("doc_b"))
    val inter = graft.functions.GraftFunctions
      .sortedIntersectSize(col("sha"), col("shb"))
    val uni = size(col("sha")).cast("long") +
      size(col("shb")).cast("long") - inter
    val jac = pairs.select(col("doc_a"), col("doc_b"),
      inter.as("i"), uni.as("u"))
      .select(col("doc_a"), col("doc_b"),
        expr("(10L * i) div u").as("jac_decile"))
    val sampBands = bucketsOf(samp)
    val collided = sampBands.as("x").join(broadcast(sampBands.as("y")),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .withColumn("c", lit(1L))
    jac.join(broadcast(collided), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("jac_decile"),
        coalesce(col("c"), lit(0L)).as("is_candidate"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val lshCalibrationSql: String =
    s"""WITH $bandsSqlCtes,
       |csamp AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0
       |  ORDER BY ${Hashing.idHashSql("doc_id")}, doc_id LIMIT $CalibN),
       |cjac AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  (10 * len(list_intersect(a.sh, b.sh)))
       |    // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |    AS jac_decile
       |  FROM csamp a JOIN csamp b ON a.doc_id < b.doc_id),
       |ccol AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  WHERE x.doc_id IN (SELECT doc_id FROM csamp)
       |    AND y.doc_id IN (SELECT doc_id FROM csamp))
       |SELECT jac_decile,
       |  CAST(CASE WHEN ccol.doc_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_candidate,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM cjac LEFT JOIN ccol USING (doc_a, doc_b)
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- prefix-filter join

  /** Jaccard threshold of the exact join, in permille (≥ 0.8). */
  private[ext] val PrefixTauPermille = 800L

  /** EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al.
    * WWW'08) — the deterministic complement to [[minhashLsh]]: LSH
    * trades recall for candidate volume, this path guarantees recall 1
    * by construction. Tokens (3-word shingle hashes) get a global
    * rarest-first total order (df asc, hash asc); each doc indexes only
    * its first p = n − ceil(τ·n) + 1 tokens in that order, and the
    * prefix-filtering principle says any pair with J ≥ τ MUST collide
    * on at least one indexed token (if A and B share so few tokens that
    * none of A's p rarest are in B's prefix, their overlap is provably
    * below τ·max(|A|,|B|) — since J ≥ τ forces |A∩B| ≥ τ|A| and
    * ≥ τ|B|, the contrapositive prunes). Collisions are verified with
    * the same exact two-pointer intersect the LSH path uses, so the
    * output IS the full ≥τ pair set — which is exactly what the gate
    * proves: the DuckDB oracle brute-forces every token-sharing pair
    * with no prefix pruning at all, and the hashes must match.
    *
    * Threshold semantics are integer end-to-end: J ≥ 0.8 tested as
    * 5·inter ≥ 4·union (no float compare on the boundary), and the
    * reported score is floor permille — boundary pairs (5·inter =
    * 4·union exactly) are IN, pinned by DedupSpec.
    *
    * Scale shape: the df table is a map-side-combinable count; the
    * per-doc prefix selection is one doc_id-keyed window; the candidate
    * join is an ordinary equi-join on token hash whose fan-out is
    * Σ_h df_prefix(h)² — bounded because prefixes keep only each doc's
    * RAREST ~(1−τ) fraction of tokens (a corpus-frequent shingle never
    * enters a prefix unless a doc has nothing rarer), the sharp
    * contrast to joining on raw shingles where one boilerplate shingle
    * detonates df². No all-pairs term anywhere; all three joins are
    * keyed. Verification cost is |candidates|, ≥ the true pair count
    * and typically within a small factor of it. */
  def jaccardPrefixJoin(spark: SparkSession, sfDir: String): DataFrame =
    jaccardPrefixOf(shingled(spark, sfDir), PrefixTauPermille)

  /** The join itself over any `(doc_id, sh: array<long>)` frame —
    * split out so the spec can feed adversarial set families (boundary
    * pairs, disjoint prefixes) straight into the algorithm. */
  private[graft] def jaccardPrefixOf(shIn: DataFrame,
      tauPermille: Long): DataFrame = {
    val sh = shIn.filter(size(col("sh")) > 0).localCheckpoint()
    val cand = prefixCandidatesOf(sh, tauPermille)
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), inter.as("inter"),
        (size(col("sha")).cast("long") + size(col("shb")).cast("long") - inter)
          .as("uni"))
      .filter(col("inter") * 1000L >= lit(tauPermille) * col("uni"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        expr("inter * 1000 div uni").as("jac_permille"))
  }

  // ---------------------------------------------- containment join

  /** Containment threshold |A∩B| / |A| ≥ 0.9, in permille. */
  private[ext] val ContainTauPermille = 900L

  /** EXACT one-sided containment self-join — the asymmetric case the
    * Jaccard paths structurally miss: a short document pasted inside a
    * much longer one has |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| (far
    * below any usable τ), and minhash collision probability TRACKS
    * Jaccard, so neither [[minhashLsh]] nor [[jaccardPrefixJoin]] can
    * see it. Quote inclusion, boilerplate wrapping, and chunk-level
    * test-set leakage are all this shape, which is why decontamination
    * pipelines key on containment (Brown et al. 2020's n-gram overlap
    * is a containment test on the SMALLER side).
    *
    * One-sided prefix principle: if |A∩B| ≥ τ·|A| then fewer than
    * p = |A| − ⌈τ·|A|⌉ + 1 of A's tokens lie outside B, so A's p
    * rarest tokens (global df-asc order, the [[jaccardPrefixJoin]]
    * total order) must hit B — candidates are prefix(A) ⨝ inverted
    * index(B) on token, recall 1 by construction, verified with the
    * exact two-pointer intersect. The oracle brute-forces every
    * ordered token-sharing pair with no pruning; hash equality proves
    * completeness.
    *
    * Scale shape: same df table and prefix window as the Jaccard join;
    * the candidate fan-out is Σ_h pf(h)·df(h) — heavier than PPJoin's
    * pf² because the CONTAINER side must index every token (asymmetry
    * is the point), but still keyed, never all-pairs; a deployment
    * caps df with a stop-shingle list exactly like an inverted-index
    * search tier. Output is ordered pairs: doc_a is the contained
    * side. */
  def containmentJoin(spark: SparkSession, sfDir: String): DataFrame =
    containmentOf(shingled(spark, sfDir), ContainTauPermille)

  /** The rarest-first (df asc, hash asc) per-doc prefix of a shingle
    * frame — each doc's first n − ⌈τ·n⌉ + 1 tokens in the global
    * order. Split out so the fan-out probes can count candidates
    * directly: a corpus-universal boilerplate token has MAXIMUM df, so
    * it never enters a prefix unless a doc has nothing rarer — the
    * property that keeps the candidate join's Σ fan-out off the df²
    * detonation a raw token join pays. */
  private[graft] def prefixTokensOf(sh: DataFrame,
      tauPermille: Long): DataFrame = {
    val tok = sh.select(col("doc_id"), size(col("sh")).cast("long").as("n"),
      explode(col("sh")).as("h"))
    val dfTab = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    tok.join(dfTab, Seq("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .filter(col("rn") <=
        col("n") - expr(s"($tauPermille * n + 999) div 1000") + 1L)
      .select(col("doc_id"), col("h"))
  }

  /** Symmetric prefix⋈prefix candidates (the Jaccard join's stage). */
  private[graft] def prefixCandidatesOf(sh: DataFrame,
      tauPermille: Long): DataFrame = {
    val prefix = prefixTokensOf(sh, tauPermille)
    prefix.as("x").join(prefix.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** One-sided prefix⋈inverted-index candidates (containment's stage). */
  private[graft] def containCandidatesOf(sh: DataFrame,
      tauPermille: Long): DataFrame = {
    val tok = sh.select(col("doc_id"), explode(col("sh")).as("h"))
    prefixTokensOf(sh, tauPermille)
      .select(col("doc_id").as("doc_a"), col("h"))
      .join(tok.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** The join over any `(doc_id, sh: array<long>)` frame — split out
    * for DedupSpec's planted small-inside-big families. */
  private[graft] def containmentOf(shIn: DataFrame,
      tauPermille: Long): DataFrame = {
    val sh = shIn.filter(size(col("sh")) > 0).localCheckpoint()
    containmentVerify(sh, containCandidatesOf(sh, tauPermille), tauPermille)
  }

  /** The exact-intersect verify leg of the containment join, over an
    * arbitrary candidate set — shared by the full tier above and the
    * capped-candidate bounded tier ([[DedupBounded]]). `sh` must
    * already be size>0-filtered. */
  private[ext] def containmentVerify(sh: DataFrame, cand: DataFrame,
      tauPermille: Long): DataFrame = {
    val inter =
      graft.functions.GraftFunctions.sortedIntersectSize(col("sha"), col("shb"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), inter.as("inter"),
        size(col("sha")).cast("long").as("n_a"),
        size(col("shb")).cast("long").as("n_b"))
      .filter(col("inter") * 1000L >= lit(tauPermille) * col("n_a"))
      .withColumn("cont_permille", expr("inter * 1000 div n_a"))
  }

  /** Brute force: every ordered token-sharing pair — a pair sharing no
    * token has containment 0 — so this is the complete ≥τ ground
    * truth for the pruned path. */
  val containmentJoinSql: String =
    s"""WITH $shingledSqlCte,
       |shnz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |u AS (SELECT doc_id, unnest(sh) AS h FROM shnz),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM u a JOIN u b ON a.h = b.h AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shnz)
       |SELECT doc_a, doc_b, inter, sa.n AS n_a, sb.n AS n_b,
       |  (inter * 1000) // sa.n AS cont_permille
       |FROM pairs
       |JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |WHERE inter * 1000 >= $ContainTauPermille * sa.n""".stripMargin

  /** Brute force, deliberately: every token-sharing pair, no prefix
    * pruning — pairs sharing NO token have J = 0 < τ, so this is the
    * complete ≥τ ground truth the pruned Spark path must reproduce. */
  val jaccardPrefixJoinSql: String =
    s"""WITH $shingledSqlCte,
       |shnz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |u AS (SELECT doc_id, unnest(sh) AS h FROM shnz),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM u a JOIN u b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM shnz)
       |SELECT doc_a, doc_b, inter,
       |  sa.n + sb.n - inter AS uni,
       |  (inter * 1000) // (sa.n + sb.n - inter) AS jac_permille
       |FROM pairs
       |JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |WHERE inter * 1000 >= $PrefixTauPermille * (sa.n + sb.n - inter)""".stripMargin

  // ---------------------------------------------- method agreement

  /** Per-document dedup decision table — which of four signals fired:
    * exact (byte hash group ≥ 2), fingerprint (whitespace-normalized
    * hash group ≥ 2), minhash (endpoint of a verified ≥0.8-Jaccard LSH
    * pair), contained (the contained side of a ≥0.9 containment pair).
    * This is the audit a curation pipeline runs when TUNING its dedup
    * stack: where the methods agree the decision is safe; where exactly
    * one fires, that method's threshold is doing unilateral work and
    * deserves review (the standard practice when composing exact +
    * near-dup + containment passes, cf. Lee et al. 2022's comparison of
    * dedup signals). Flags are 0/1 BIGINTs — bit-identical across
    * engines, no boolean-ordering subtleties.
    *
    * Scale shape: two hash-group passes (map-side combinable), the two
    * pair joins reuse the gated plans (and the session-memoized frames
    * under them), and the final per-doc agg is one keyed exchange over
    * only the flagged docs. */
  def methodAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    def groupDocs(key: org.apache.spark.sql.Column, m: String) = {
      val g = docs.groupBy(key.as("h")).agg(count(lit(1)).as("c"))
      docs.select(col("doc_id"), key.as("h"))
        .join(g, "h").filter(col("c") >= 2)
        .select(col("doc_id"), lit(m).as("m"))
    }
    val flags = groupDocs(md5(col("text")), "exact")
      .unionAll(groupDocs(
        md5(graft.functions.GraftFunctions.normalizeWs(col("text"))), "fp"))
      .unionAll(minhashLsh(spark, sfDir).select(col("doc_a").as("doc_id"))
        .unionAll(minhashLsh(spark, sfDir).select(col("doc_b").as("doc_id")))
        .select(col("doc_id"), lit("minhash").as("m")))
      .unionAll(containmentJoin(spark, sfDir)
        .select(col("doc_a").as("doc_id"), lit("contained").as("m")))
      .distinct()
    def flag(m: String) = max(when(col("m") === m, 1L).otherwise(0L))
    flags.groupBy(col("doc_id"))
      .agg(flag("exact").as("is_exact"), flag("fp").as("is_fingerprint"),
        flag("minhash").as("is_minhash"), flag("contained").as("is_contained"))
      .withColumn("n_methods",
        col("is_exact") + col("is_fingerprint") + col("is_minhash") +
          col("is_contained"))
  }

  lazy val methodAgreementSql: String = // lazy: composes SQLs declared below
    s"""WITH mh AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
       |ct AS (SELECT doc_a FROM ($containmentJoinSql)),
       |exg AS (SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY 1),
       |fpg AS (SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h,
       |  COUNT(*) AS c FROM documents GROUP BY 1),
       |flags AS (
       |  SELECT d.doc_id, 'exact' AS m FROM documents d
       |    JOIN exg ON md5(d.text) = exg.h WHERE exg.c >= 2
       |  UNION
       |  SELECT d.doc_id, 'fp' FROM documents d
       |    JOIN fpg ON md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g')) = fpg.h
       |    WHERE fpg.c >= 2
       |  UNION
       |  SELECT doc_a, 'minhash' FROM mh
       |  UNION
       |  SELECT doc_b, 'minhash' FROM mh
       |  UNION
       |  SELECT doc_a, 'contained' FROM ct)
       |SELECT doc_id,
       |  CAST(MAX(CASE WHEN m = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS is_exact,
       |  CAST(MAX(CASE WHEN m = 'fp' THEN 1 ELSE 0 END) AS BIGINT) AS is_fingerprint,
       |  CAST(MAX(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END) AS BIGINT) AS is_minhash,
       |  CAST(MAX(CASE WHEN m = 'contained' THEN 1 ELSE 0 END) AS BIGINT) AS is_contained,
       |  CAST(MAX(CASE WHEN m = 'exact' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN m = 'fp' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN m = 'minhash' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN m = 'contained' THEN 1 ELSE 0 END) AS BIGINT) AS n_methods
       |FROM flags GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_method_agreement" -> (methodAgreement _),
    "dedup_containment" -> (containmentJoin _),
    "dedup_jaccard_prefix" -> (jaccardPrefixJoin _),
    "dedup_lsh_calibration" -> (lshCalibration _),
    "dedup_exact" -> (exact _),
    "dedup_fingerprint" -> (fingerprintDedup _),
    "dedup_simhash" -> (simhash _),
    "dedup_simhash62" -> (simhash62 _),
    "dedup_simhash_hamming" -> (simhashHamming _),
    "dedup_sorted_neighborhood" -> (sortedNeighborhood _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_edit_distance" -> (editDistanceDedup _),
    "dedup_ngram_jaccard" -> (ngramJaccardSample _),
    "dedup_embedding_cosine" -> (embeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "dedup_method_agreement" -> methodAgreementSql,
    "dedup_containment" -> containmentJoinSql,
    "dedup_jaccard_prefix" -> jaccardPrefixJoinSql,
    "dedup_lsh_calibration" -> lshCalibrationSql,
    "dedup_exact" -> exactSql,
    "dedup_fingerprint" -> fingerprintDedupSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash62" -> simhash62Sql,
    "dedup_simhash_hamming" -> simhashHammingSql,
    "dedup_sorted_neighborhood" -> sortedNeighborhoodSql,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_edit_distance" -> editDistanceDedupSql,
    "dedup_ngram_jaccard" -> ngramJaccardSampleSql,
    "dedup_embedding_cosine" -> embeddingNearDupSql)
}
