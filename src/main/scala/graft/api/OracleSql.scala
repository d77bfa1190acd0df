package graft.api

/** Oracle-SQL hygiene applied once, at the single point where the
  * registry's DuckDB SQL is emitted for the driver ([[graft.Verify]]).
  *
  * Signed zeros: DuckDB's `round(-3.5e-7, 6)` returns IEEE `-0.0`;
  * Spark's BigDecimal-based `round` has no signed zero and returns
  * `+0.0`. Every value comparator calls them equal, but the driver
  * hashes BYTES after sorting columns, so one tiny-negative cell
  * rounding to zero is a red row (the r9/r10 p75 red — mechanism found
  * round 11). Rather than patching each query's SQL with a CASE, every
  * `round(...)` call site is wrapped as `(round(...) + 0)`: IEEE
  * addition of +0 preserves every value and NULL, and collapses `-0.0`
  * to `+0.0` — the uniform rule `tools/check.py`'s signed-zero detector
  * assumes.
  */
object OracleSql {

  /** Wrap every `round(...)` call in `sql` as `(round(...) + 0)`,
    * recursively (nested rounds are wrapped too). Single-quoted string
    * literals are left untouched, both when matching the function name
    * and when counting parentheses.
    */
  def normalizeSignedZeros(sql: String): String = {
    val out = new StringBuilder(sql.length + 64)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val end = skipLiteral(sql, i)
        out.append(sql.substring(i, end))
        i = end
      } else if (atRoundCall(sql, i)) {
        val open = i + 5 // index of '('
        val close = matchParen(sql, open)
        out.append("(round(")
          .append(normalizeSignedZeros(sql.substring(open + 1, close)))
          .append(") + 0)")
        i = close + 1
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Is `round(` at `i`, as a function call (not a suffix of a longer
    * identifier like `my_round(`)? */
  private def atRoundCall(sql: String, i: Int): Boolean =
    sql.regionMatches(true, i, "round(", 0, 6) &&
      (i == 0 || {
        val p = sql.charAt(i - 1)
        !Character.isLetterOrDigit(p) && p != '_'
      })

  /** Index just past a single-quoted SQL literal starting at `i`
    * (handles `''` escapes). */
  private def skipLiteral(sql: String, i: Int): Int = {
    var j = i + 1
    while (j < sql.length) {
      if (sql.charAt(j) == '\'') {
        if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 2
        else return j + 1
      } else j += 1
    }
    sql.length
  }

  /** Index of the ')' matching the '(' at `open`, skipping literals. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var j = open
    while (j < sql.length) {
      sql.charAt(j) match {
        case '\'' => j = skipLiteral(sql, j) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced parentheses in oracle SQL at offset $open")
  }
}
