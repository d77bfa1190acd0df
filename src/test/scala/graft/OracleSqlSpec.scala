package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.OracleSql.normalizeSignedZeros

/** The uniform signed-zero rule applied to oracle SQL at emission time
  * (ADVICE r11: normalize zeros uniformly instead of per-query CASE).
  */
class OracleSqlSpec extends AnyFunSuite {

  test("wraps a round call as (round(...) + 0)") {
    assert(normalizeSignedZeros("SELECT round(x, 6) AS a FROM t") ==
      "SELECT (round(x, 6) + 0) AS a FROM t")
  }

  test("wraps nested rounds recursively and handles nested parens") {
    assert(normalizeSignedZeros("round(round(sum(x), 6) / n, 2)") ==
      "(round((round(sum(x), 6) + 0) / n, 2) + 0)")
  }

  test("leaves string literals and longer identifiers untouched") {
    val sql = "SELECT my_round(x), 'round(1)' AS lit FROM t"
    assert(normalizeSignedZeros(sql) == sql)
    // doubled-quote escape inside a literal, parens inside a literal
    val tricky = "SELECT 'it''s round(' FROM t WHERE round(y) > 0"
    assert(normalizeSignedZeros(tricky) ==
      "SELECT 'it''s round(' FROM t WHERE (round(y) + 0) > 0")
  }

  test("case-insensitive match; unbalanced parens fail fast") {
    assert(normalizeSignedZeros("ROUND(x, 1)") == "(round(x, 1) + 0)")
    intercept[IllegalArgumentException] { normalizeSignedZeros("round(x") }
  }

  test("duckdb agrees: the wrap collapses -0.0 and preserves values (spot-checked constants)") {
    // The IEEE facts the rule relies on, pinned as JVM arithmetic (the
    // same IEEE-754 doubles DuckDB computes with): -0.0 + 0 == +0.0 by
    // BYTES, and x + 0 == x for every normal value and NULL.
    assert((-0.0 + 0).toString == "0.0")
    assert(java.lang.Double.doubleToRawLongBits(-0.0 + 0) ==
      java.lang.Double.doubleToRawLongBits(0.0))
    Seq(1.25, -7.5e-7, 123456.654321, Double.MinPositiveValue).foreach {
      x => assert(java.lang.Double.doubleToRawLongBits(x + 0) ==
        java.lang.Double.doubleToRawLongBits(x))
    }
  }
}
