package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hash family.
  *
  * Everything in the dedup/similarity layer needs hashes that are (a)
  * computable inside Catalyst (codegen-able built-ins / HOFs, no UDF) and
  * (b) reproducible bit-for-bit in the DuckDB oracle. Spark's own
  * hash()/xxhash64() and DuckDB's hash() are different algorithms, so we
  * use explicit polynomial folds over exact Long arithmetic:
  *
  *   h(s)        = fold chars: (acc*31 + codepoint)  mod P
  *   shingle(ws) = fold word hashes: (acc*1000003 + h) mod P
  *   perm_i(h)   = (a_i*h + b_i) mod P          (universal hashing)
  *
  * with P = 2^31-1 (prime). All intermediates fit in Long: acc < 2^31,
  * so acc*1000003 < 2^51 and a_i*h < 2^62.
  */
object Hashing {

  val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** MinHash permutation constants (fixed seed, shared with oracle SQL).
    * Simple LCG-spread odd multipliers; any a in [1, P-1] is invertible
    * mod the prime P. Single source of truth: the compute kernel. */
  val NumPerms: Int = graft.functions.HashKernels.NumPerms
  val permA: Seq[Long] = graft.functions.HashKernels.permA.toSeq
  val permB: Seq[Long] = graft.functions.HashKernels.permB.toSeq

  /** Force every CTE in a DuckDB oracle to materialize (`name AS
    * MATERIALIZED (...)`). The unrolled-round graph oracles chain CTEs
    * that each reference the previous round TWICE; DuckDB's default
    * CTE inlining then re-expands the whole prefix per reference —
    * 2^rounds copies of the base self-join, measured as a >75 GB spill
    * for the sf1 k-core oracle where the materialized form runs in
    * 5 s. The rewrite is anchored to CTE-definition sites only — an
    * identifier followed by `AS (` at the start of the statement or
    * right after a `,`/`WITH` (round-10 advisory: a blind
    * `replace("AS (", …)` would also hit an `AS (` inside a string
    * literal or a non-CTE context, silently corrupting any future
    * oracle routed through here). Oracle-side only — the Spark plans
    * localCheckpoint per round and never re-expand.
    *
    * `except` rules (callers MUST list these): (1) recursive working
    * tables — the engine rejects MATERIALIZED on them; (2) any CTE
    * referenced from a correlated subquery INSIDE a recursive CTE —
    * the engine mis-executes that shape (observed at sf3: the greedy
    * tokenizer's per-step vocab probe intermittently missed matches
    * when `vocab` was materialized, with results varying across
    * executions of the identical statement). Such CTEs are typically
    * tiny (a top-K vocab); leaving them plain costs nothing. */
  def materializeCtes(sql: String, except: Set[String] = Set.empty): String = {
    // (WITH [RECURSIVE] | , ) <identifier> [(col,…)] AS (  →  … AS MATERIALIZED (
    // \w+ cannot match inside a quoted SQL string unless the quote
    // char immediately precedes it, which `(?:WITH|,)\s*` excludes.
    // Covers RECURSIVE (otherwise consumed as the identifier, leaving
    // the real first CTE unmaterialized) and column-list CTEs
    // `name(a,b) AS (` (round-11 advisory). `except` names CTEs that
    // must stay plain — a RECURSIVE CTE is its own working table and
    // the engine rejects MATERIALIZED on it (packing's `rec`, the
    // component closure's `reach`, greedy tokenization's `tok`).
    val exceptLc = except.map(_.toLowerCase)
    val site =
      """(?is)((?:\bWITH\b(?:\s+RECURSIVE\b)?|,)\s*)(\w+)(\s*(?:\([^)]*\))?\s+AS)\s*\(""".r
    val out = site.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        if (exceptLc.contains(m.group(2).toLowerCase))
          m.group(1) + m.group(2) + m.group(3) + " ("
        else m.group(1) + m.group(2) + m.group(3) + " MATERIALIZED ("))
    // Post-condition: a definition-site `AS (` the pattern missed would
    // silently reintroduce the exponential re-expansion this rewrite
    // exists to prevent — fail loudly instead. (Re-running the finder on
    // the output matches only excepted sites and sites still followed
    // directly by `(`.)
    site.findAllMatchIn(out)
      .find(m => !exceptLc.contains(m.group(2).toLowerCase))
      .foreach { miss =>
        throw new IllegalStateException(
          s"materializeCtes left an unmaterialized CTE site: '${miss.matched}'")
      }
    out
  }

  /** Order-scrambling 31-bit hash of an integer id column. Purpose:
    * deterministic CONSTANT-SIZE samples — `ORDER BY idHash(id), id
    * LIMIT n` picks the same n rows in Spark and DuckDB at any corpus
    * size, so a broadcast query/audit sample stays bounded at 100 TB
    * (a `id % k = 0` sample grows linearly and eventually kills the
    * broadcast). Overflow-safe: (id mod P) < 2^31, ×40503 < 2^47. */
  def idHash(c: Column): Column = ((c % P) * 40503L + 12345L) % P

  /** Same, as DuckDB SQL over an integer expression. FULLY
    * parenthesized: callers embed this inside products
    * (`a*${idHashSql(k)} + b`), and SQL's `*`/`%` share precedence
    * left-to-right, so without the outer parens the caller's `a*` bound
    * to the UN-reduced inner term — mathematically identical mod P, but
    * it overflows DuckDB's checked INT64 once ids reach sf1's shifted
    * key range (the round-10 sf1 audit caught both bloom gates). */
  def idHashSql(e: String): String =
    s"((($e % 2147483647) * 40503 + 12345) % 2147483647)"

  /** 31-bit polynomial hash of a whole string column (char fold).
    * Production path: native codegen'd expression (graft.functions). */
  def stringHash(c: Column): Column = graft.functions.GraftFunctions.polyHash(c)

  /** HOF rendition of [[stringHash]] — kept as the executable spec the
    * native kernel is parity-tested against (HashParitySpec). */
  def stringHashHof(c: Column): Column =
    aggregate(
      transform(regexp_extract_all(c, lit("[\\s\\S]"), lit(0)),
        ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % P)

  /** Same, as DuckDB SQL over an arbitrary string expression. */
  def stringHashSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"regexp_extract_all($e, '[\\s\\S]'), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a*31 + b) % 2147483647)"

  /** Array of word hashes from a text column (lowercased ASCII words).
    * Production path: one-pass native expression. */
  def wordHashes(text: Column): Column =
    graft.functions.GraftFunctions.wordHashes(text)

  /** HOF rendition of [[wordHashes]] (parity spec only). */
  def wordHashesHof(text: Column): Column =
    transform(
      filter(split(lower(text), "[^a-z]+"), t => length(t) > lit(0)),
      w => aggregate(
        transform(regexp_extract_all(w, lit("[\\s\\S]"), lit(0)),
          ch => ascii(ch).cast("long")),
        lit(0L), (acc, x) => (acc * 31 + x) % P))

  def wordHashesSql(e: String): String =
    s"list_transform(list_filter(regexp_split_to_array(lower($e), '[^a-z]+'), t -> t <> ''), " +
      s"w -> ${stringHashSql("w")})"

  /** k-word shingle hashes (k consecutive word hashes folded), distinct
    * (native kernel returns them SORTED — set semantics, enabling the
    * two-pointer intersect). `whs` must be a word-hash array column. */
  def shingleHashes(whs: Column, k: Int): Column =
    graft.functions.GraftFunctions.shingleHashes(whs, k)

  /** HOF rendition of [[shingleHashes]] (parity spec only; first-occurrence
    * order rather than sorted — compare as sets). */
  def shingleHashesHof(whs: Column, k: Int): Column =
    array_distinct(
      when(size(whs) >= k,
        transform(
          sequence(lit(0), size(whs) - k),
          i => aggregate(slice(whs, i + 1, lit(k)), lit(0L),
            (acc, x) => (acc * 1000003 + x) % P)))
        .otherwise(array().cast("array<bigint>")))

  def shingleHashesSql(whsExpr: String, k: Int): String =
    s"list_distinct(list_transform(range(0, greatest(len($whsExpr) - ${k - 1}, 0)), " +
      s"i -> list_reduce(list_prepend(0::BIGINT, list_slice($whsExpr, i + 1, i + $k)), " +
      s"(a, b) -> (a*1000003 + b) % 2147483647)))"

  /** Positional k-word span hashes: [[shingleHashesSql]] without the
    * distinct — multiplicity and order preserved (mirrors the native
    * spanHashes kernel). */
  def spanHashes(whs: Column, k: Int): Column =
    graft.functions.GraftFunctions.spanHashes(whs, k)

  def spanHashesSql(whsExpr: String, k: Int): String =
    s"list_transform(range(0, greatest(len($whsExpr) - ${k - 1}, 0)), " +
      s"i -> list_reduce(list_prepend(0::BIGINT, list_slice($whsExpr, i + 1, i + $k)), " +
      s"(a, b) -> (a*1000003 + b) % 2147483647))"

  /** Base-37 twin of [[wordHashes]] — the independent second family the
    * widened span hash is built from. */
  def wordHashes37(text: Column): Column =
    graft.functions.GraftFunctions.wordHashes37(text)

  def wordHashes37Sql(e: String): String =
    s"list_transform(list_filter(regexp_split_to_array(lower($e), '[^a-z]+'), t -> t <> ''), " +
      s"w -> list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"regexp_extract_all(w, '[\\s\\S]'), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a*37 + b) % 2147483647))"

  /** Widened positional span hashes: two independent 31-bit folds packed
    * as h1·2^31 + h2 (< 2^62 — replayable in DuckDB's checked BIGINT,
    * where a wrapping 64-bit hash could not run). False-span odds drop
    * from ~n²/2^31 to ~n²/2^62: the production family for corpus-scale
    * substring dedup. */
  def spanHashes64(whs1: Column, whs2: Column, k: Int): Column =
    graft.functions.GraftFunctions.spanHashes64(whs1, whs2, k)

  def spanHashes64Sql(whs1Expr: String, whs2Expr: String, k: Int): String =
    s"list_transform(range(0, greatest(len($whs1Expr) - ${k - 1}, 0)), " +
      s"i -> list_reduce(list_prepend(0::BIGINT, list_slice($whs1Expr, i + 1, i + $k)), " +
      s"(a, b) -> (a*1000003 + b) % 2147483647) * 2147483648 + " +
      s"list_reduce(list_prepend(0::BIGINT, list_slice($whs2Expr, i + 1, i + $k)), " +
      s"(a, b) -> (a*1000033 + b) % 2147483647))"
}
