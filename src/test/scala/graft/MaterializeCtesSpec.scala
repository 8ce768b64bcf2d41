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
    // The three graph oracles that ship through materializeCtes must
    // contain one MATERIALIZED per CTE and zero doubled keywords.
    for (sql <- Seq(ext.Hits.partsHitsSql)) {
      assert(!sql.contains("MATERIALIZED MATERIALIZED"))
      assert(sql.contains("AS MATERIALIZED ("))
    }
  }
}
