package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality audits — the validation pass an ingest pipeline runs
  * before promoting a snapshot.
  *
  * 1. [[lengthHistogram]]: log2-bucketed doc-length distribution (the
  *    shape report a tokenizer budget is planned from). The bucket is
  *    computed INTEGER-exactly as length(bin(n)) − 1 — both engines
  *    print the same binary string, so no float log2 can round a
  *    power-of-two edge differently.
  * 2. [[integrityAudit]]: referential-integrity violation counts
  *    across the warehouse tables (orphaned facts, dangling dims) —
  *    each check one anti-join semi-aggregated to a single row, so the
  *    report is O(#checks) rows at any scale. The corpus itself is
  *    healthy, which would make an all-zero report vacuous (both
  *    engines agreeing on zero proves detectors COMPILE, not that they
  *    FIRE) — so, the pii/phash pattern: both engines deterministically
  *    corrupt the same idHash-derived fact slices (orphaned lineitems,
  *    orders pointing at absent customers) before checking, and must
  *    EARN matching non-zero counts through their anti-join machinery.
  *    The four unperturbed edges prove the detectors also stay silent
  *    on healthy data.
  * 3. [[snapshotDiff]]: the ingest diff report between a prior corpus
  *    snapshot and the current one (replayed with the deterministic
  *    idHash split shared with [[Incremental]]): rows added, and
  *    rows carried over, counted from a doc_id full-outer join of
  *    content fingerprints — ONE shuffle, the CDC summary a rolling
  *    pipeline logs per ingest.
  */
object Audit {

  /** Log2 histogram of document lengths: bucket b covers [2^b, 2^b+1). */
  def lengthHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bucket",
        (length(bin(col("n_chars"))) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val lengthHistogramSql: String =
    """SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** Planted-corruption slice moduli. ~1% of lineitems get an orphaned
    * order key and ~1% of orders a dangling customer key: non-empty at
    * sf0.001 (≈60 / ≈15 rows) and proportionally at every SF. Negated
    * keys (−k−1) are guaranteed absent from the dims, whose keys are
    * positive. */
  private val LiOrphanMod = 97L
  private val OrdDanglingMod = 101L

  /** Referential-integrity checks over the deterministically corrupted
    * snapshot, one row per check. */
  def integrityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    def violations(name: String, fact: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String): DataFrame =
      fact.select(col(factKey).as("k"))
        .join(dim.select(col(dimKey).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    // Corrupt the same deterministic slices the oracle does. The
    // (l_orderkey, l_linenumber) pair identifies a lineitem row; ×8
    // keeps the combination injective (linenumber ≤ 7).
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("l_orderkey",
        when(Hashing.idHash(col("l_orderkey") * 8 + col("l_linenumber"))
            % LiOrphanMod === 0,
          -col("l_orderkey") - 1)
          .otherwise(col("l_orderkey")))
    val o = Tables.orders(spark, sfDir)
      .withColumn("o_custkey",
        when(Hashing.idHash(col("o_orderkey")) % OrdDanglingMod === 0,
          -col("o_custkey") - 1)
          .otherwise(col("o_custkey")))
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    violations("lineitem_order", li, "l_orderkey", o, "o_orderkey")
      .unionAll(violations("lineitem_part", li, "l_partkey",
        Tables.part(spark, sfDir), "p_partkey"))
      .unionAll(violations("lineitem_supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionAll(violations("order_customer", o, "o_custkey", c, "c_custkey"))
      .unionAll(violations("customer_nation", c, "c_nationkey", n, "n_nationkey"))
      .unionAll(violations("supplier_nation", s, "s_nationkey", n, "n_nationkey"))
  }

  val integrityAuditSql: String = {
    // NOT EXISTS, not NOT IN: a NULL foreign key must COUNT as a
    // violation (Spark's left_anti does), but NOT IN would evaluate it
    // to NULL and silently count 0 — the engines would diverge exactly
    // when integrity first breaks.
    def one(name: String, fact: String, fk: String, dim: String,
        dk: String): String =
      s"""SELECT '$name' AS "check", CAST(COUNT(*) AS BIGINT) AS n_violations
         |FROM $fact f WHERE NOT EXISTS (
         |  SELECT 1 FROM $dim d WHERE d.$dk = f.$fk)""".stripMargin
    // Same deterministic corruption as the Spark side; the oracle's
    // anti-joins then run over the corrupted CTEs, so both engines
    // must find the planted violations the same way.
    val liIh = Hashing.idHashSql("l_orderkey*8 + l_linenumber")
    val ordIh = Hashing.idHashSql("o_orderkey")
    val ctes =
      s"""WITH lineitem_p AS (
         |  SELECT CASE WHEN ($liIh) % $LiOrphanMod = 0
         |              THEN -l_orderkey - 1 ELSE l_orderkey END AS l_orderkey,
         |         l_partkey, l_suppkey
         |  FROM lineitem),
         |orders_p AS (
         |  SELECT o_orderkey,
         |    CASE WHEN ($ordIh) % $OrdDanglingMod = 0
         |         THEN -o_custkey - 1 ELSE o_custkey END AS o_custkey
         |  FROM orders)""".stripMargin
    ctes + "\n" + Seq(
      one("lineitem_order", "lineitem_p", "l_orderkey", "orders_p", "o_orderkey"),
      one("lineitem_part", "lineitem_p", "l_partkey", "part", "p_partkey"),
      one("lineitem_supplier", "lineitem_p", "l_suppkey", "supplier", "s_suppkey"),
      one("order_customer", "orders_p", "o_custkey", "customer", "c_custkey"),
      one("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      one("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("\nUNION ALL\n")
  }

  /** CDC summary of one ingest step — the full four-class diff a
    * rolling pipeline logs: docs ADDED (in current only), REMOVED (in
    * the prior snapshot only), CHANGED (in both, content fingerprint
    * differs), CARRIED (in both, identical). The two snapshots are
    * synthesized deterministically from idHash(doc_id) so both engines
    * replay the same scenario and every class is NON-EMPTY at every
    * SF: prior = docs with ih%4 ≠ 0, storing a perturbed text
    * (" [v1]" suffix) for the ih%8 == 1 slice; current = docs with
    * ih%16 ≠ 2. The three moduli classes are pairwise disjoint, so the
    * oracle can state the ground truth per doc arithmetically while
    * the Spark side must EARN it through the full-outer fingerprint
    * join — a mis-hashed text, a dropped null branch, or a wrong join
    * side lands docs in the wrong class and hash-mismatches.
    *
    * Scale: one corpus-keyed full-outer join (doc_id shuffle), hashes
    * computed map-side; the report is 4 rows. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"),
        Hashing.idHash(col("doc_id")).as("ih"))
    val old = docs.filter(col("ih") % 4 =!= 0)
      .select(col("doc_id"),
        Hashing.stringHash(
          when(col("ih") % 8 === 1, concat(col("text"), lit(" [v1]")))
            .otherwise(col("text"))).as("h_old"),
        (col("n_chars") +
          when(col("ih") % 8 === 1, 5L).otherwise(0L)).as("len_old"))
    val cur = docs.filter(col("ih") % 16 =!= 2)
      .select(col("doc_id"), Hashing.stringHash(col("text")).as("h_new"),
        col("n_chars"))
    cur.join(old, Seq("doc_id"), "full_outer")
      .withColumn("class",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("carried"))
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), col("len_old"))).as("chars"))
  }

  /** Ground truth per doc from the moduli alone (removed docs are never
    * perturbed — ih%16==2 ⇒ ih%8==2 — so every class's char mass is
    * plain n_chars). */
  val snapshotDiffSql: String = {
    val ih = Hashing.idHashSql("doc_id")
    s"""SELECT CASE WHEN ($ih) % 4 = 0 THEN 'added'
       |            WHEN ($ih) % 16 = 2 THEN 'removed'
       |            WHEN ($ih) % 8 = 1 THEN 'changed'
       |            ELSE 'carried' END AS "class",
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS chars
       |FROM documents GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------ Heaps' law

  /** Vocabulary-growth (Heaps'-law) curve: at each doc-count checkpoint
    * 2^k, how many documents, running tokens, and DISTINCT word types
    * the corpus prefix contains. The curve's bend is the collect-more-
    * data signal (V ≈ K·n^β flattening early means the source is
    * exhausting its vocabulary — a dedup/diversity red flag upstream of
    * training-mix decisions).
    *
    * Checkpoints are doc_id-PREFIX filters (docs with doc_id < 2^k),
    * valid because ingest assigns doc_id monotonically — so "the first
    * N documents" needs NO global rank/sort at any scale. Each word
    * type's first occurrence is one wh-keyed min aggregation
    * (map-side combinable, and words travel as the 31-bit hashes of
    * [[Hashing.wordHashes]], Long shuffles — the lang-ID discipline);
    * a first occurrence at doc d then contributes one row per
    * checkpoint ≥ d via an integer-exact `sequence(len(bin(d)), L)`
    * fan-out, bounded by L = log2(corpus) ≤ ~47 rows at any SF and ~2-3
    * on average (half of all first occurrences land in the last
    * checkpoint's window). The only other input is the 1-row L
    * broadcast; output is L+1 rows. */
  def heapsLaw(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val whs = docs.select(col("doc_id"),
      Hashing.wordHashes(col("text")).as("ws"))
    val lmax = docs.agg(max(col("doc_id")).as("m"))
      .select(expr("length(bin(m))").as("L"))
    // integer-exact smallest k with 2^k > id (k_min of the contribution
    // range): length of the binary rendering, with the id-0 edge pinned.
    def kmin(c: Column): Column =
      when(c === 0L, lit(0)).otherwise(length(bin(c)).cast("int"))
    val vocab = whs.select(col("doc_id"), explode(col("ws")).as("wh"))
      .groupBy(col("wh")).agg(min(col("doc_id")).as("first_id"))
      .crossJoin(lmax)
      .withColumn("kmin", kmin(col("first_id")))
      .select(explode(expr("sequence(kmin, L)")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("vocab_size"))
    val dtk = whs
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_toks"))
      .crossJoin(lmax)
      .withColumn("kmin", kmin(col("doc_id")))
      .select(explode(expr("sequence(kmin, L)")).as("k"), col("n_toks"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"))
    dtk.join(vocab, "k")
      .select(expr("shiftleft(cast(1 as bigint), k)").as("at_docs"),
        col("n_docs"), col("n_tokens"), col("vocab_size"))
  }

  val heapsLawSql: String = {
    val kminSql = (e: String) =>
      s"CASE WHEN $e = 0 THEN 0 ELSE length(bin($e)) END"
    s"""WITH whs AS (SELECT doc_id, ${Hashing.wordHashesSql("text")} AS ws
       |             FROM documents),
       |mx AS (SELECT length(bin(MAX(doc_id))) AS L FROM documents),
       |first AS (SELECT wh, MIN(doc_id) AS first_id
       |  FROM (SELECT doc_id, unnest(ws) AS wh FROM whs) GROUP BY 1),
       |vocab AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS vocab_size
       |  FROM first, mx, UNNEST(range(${kminSql("first_id")}, L + 1)) t(k)
       |  GROUP BY 1),
       |dtk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(ws)) AS BIGINT) AS n_tokens
       |  FROM whs, mx, UNNEST(range(${kminSql("doc_id")}, L + 1)) t(k)
       |  GROUP BY 1)
       |SELECT (1::BIGINT << d.k) AS at_docs, d.n_docs, d.n_tokens,
       |  v.vocab_size
       |FROM dtk d JOIN vocab v ON d.k = v.k""".stripMargin
  }

  // ------------------------------------------------------- Zipf curve

  /** Doubling-rank cap: the report covers ranks 1..2^12, fetched as a
    * bounded TakeOrdered — never a global sort of the vocabulary. */
  val ZipfMaxRank = 4096

  /** Zipf's-law curve at doubling ranks: for rank r = 1, 2, 4, …,
    * [[ZipfMaxRank]], the r-th most frequent word's count, the
    * cumulative token coverage of the top r types, and the ratio
    * freq(r)/freq(r/2) in floored permille — the LOG-FREE rendering of
    * the Zipf slope (ideal s = 1 gives ratio 500‰ at every doubling;
    * drift from 500 IS the local slope estimate, with no
    * transcendental in sight, so both engines agree bit-for-bit where
    * an ln()-based OLS fit could not be gated). Together with the
    * Heaps curve above this is the standard corpus-health pair: a
    * too-steep head (ratio ≪ 500) means boilerplate domination; heavy
    * coverage in few types means the tokenizer will waste its vocab.
    *
    * Scale shape: word counts are one map-side-combinable groupBy on
    * the 31-bit word hash; the top-[[ZipfMaxRank]] fetch is
    * TakeOrdered (per-partition top-N + driver merge — no global
    * sort); every window after that runs on ≤ 4096 rows; the token
    * total attaches as a 1-row broadcast. */
  def zipfRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val wcounts = Tables.documents(spark, sfDir)
      .select(explode(Hashing.wordHashes(col("text"))).as("wh"))
      .groupBy(col("wh")).agg(count(lit(1)).as("freq"))
    val total = wcounts.agg(sum(col("freq")).as("total_tokens"))
    val ord = Window.orderBy(col("freq").desc, col("wh"))
    val top = wcounts
      .orderBy(col("freq").desc, col("wh")).limit(ZipfMaxRank)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_freq", sum(col("freq")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    top
      .filter(expr("(rank & (rank - 1)) = 0")) // powers of two only
      .crossJoin(broadcast(total))
      .withColumn("coverage_permille",
        expr("cum_freq * 1000 div total_tokens"))
      .withColumn("prev_freq",
        lag(col("freq"), 1).over(Window.orderBy(col("rank"))))
      .select(col("rank"), col("freq"), col("cum_freq"),
        col("coverage_permille"),
        coalesce(expr("freq * 1000 div prev_freq"), lit(1000L))
          .as("zipf_ratio_permille"))
  }

  val zipfRanksSql: String =
    s"""WITH wc AS (SELECT wh, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(${Hashing.wordHashesSql("text")}) AS wh
       |        FROM documents) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens FROM wc),
       |top AS (SELECT wh, freq,
       |    CAST(row_number() OVER (ORDER BY freq DESC, wh) AS BIGINT)
       |      AS rank,
       |    CAST(SUM(freq) OVER (ORDER BY freq DESC, wh
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_freq
       |  FROM wc ORDER BY freq DESC, wh LIMIT $ZipfMaxRank),
       |ck AS (SELECT rank, freq, cum_freq FROM top
       |  WHERE (rank & (rank - 1)) = 0)
       |SELECT rank, freq, cum_freq,
       |  cum_freq * 1000 // total_tokens AS coverage_permille,
       |  COALESCE(freq * 1000 // lag(freq, 1) OVER (ORDER BY rank),
       |    1000) AS zipf_ratio_permille
       |FROM ck, tot""".stripMargin

  // ------------------------------------------------- Benford screening

  /** Benford permille expectations for leading digits 1..9:
    * ⌊1000·log10(1 + 1/d)⌋ — CONSTANTS of the law, precomputed once
    * here (no runtime libm anywhere near the gate). */
  val BenfordPm: Seq[Long] =
    Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)

  /** Benford's-law first-digit screening of order totals — the classic
    * forensic-accounting scan ([[integrityAudit]]'s statistical
    * sibling: planted-violation checks catch rule breaks, Benford
    * catches fabricated-looking DISTRIBUTIONS). Observed leading-digit
    * counts vs the law's expectation, with the per-digit deviation in
    * permille points. On this fixture prices are uniform-ish, NOT
    * Benford — which is exactly what the report should say (the gate
    * proves the measurement, not conformance; the spec pins a
    * synthetic exponential sample CLOSE to Benford and the uniform
    * fixture FAR, so both directions of the diagnostic are
    * evidenced).
    *
    * Scale shape: leading digit is row-local string math on the cents
    * integer; one map-side-combinable 9-row agg + a 1-row total. */
  def benfordOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val d = Tables.orders(spark, sfDir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val exp = BenfordPm.zipWithIndex
      .map { case (pm, i) => (i + 1L, pm) }.toDF("digit", "benford_pm")
    d.crossJoin(broadcast(d.agg(sum(col("n")).as("n_total"))))
      .join(broadcast(exp), "digit")
      .select(col("digit"), col("n"),
        expr("(n * 1000) div n_total").as("observed_pm"),
        col("benford_pm"),
        (expr("(n * 1000) div n_total") - col("benford_pm"))
          .as("deviation_pm"))
  }

  val benfordOrdersSql: String = {
    val pairs = BenfordPm.zipWithIndex
      .map { case (pm, i) => s"(${i + 1}, $pm)" }.mkString(", ")
    s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice*100)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders),
       |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM d WHERE digit >= 1 GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
       |e AS (SELECT * FROM (VALUES $pairs) AS v(digit, benford_pm))
       |SELECT c.digit, c.n,
       |  (c.n * 1000) // t.n_total AS observed_pm,
       |  CAST(e.benford_pm AS BIGINT) AS benford_pm,
       |  (c.n * 1000) // t.n_total - e.benford_pm AS deviation_pm
       |FROM c JOIN e ON c.digit = e.digit, t""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_length_histogram" -> (lengthHistogram _),
    "corpus_heaps_law" -> (heapsLaw _),
    "corpus_zipf_ranks" -> (zipfRanks _),
    "integrity_audit" -> (integrityAudit _),
    "orders_benford_digits" -> (benfordOrders _),
    "corpus_snapshot_diff" -> (snapshotDiff _))

  val oracles: Map[String, String] = Map(
    "corpus_length_histogram" -> lengthHistogramSql,
    "corpus_heaps_law" -> heapsLawSql,
    "corpus_zipf_ranks" -> zipfRanksSql,
    "integrity_audit" -> integrityAuditSql,
    "orders_benford_digits" -> benfordOrdersSql,
    "corpus_snapshot_diff" -> snapshotDiffSql)
}
