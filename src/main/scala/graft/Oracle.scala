package graft

/** DuckDB oracle-SQL post-processing.
  *
  * Every CTE gets an `AS MATERIALIZED` hint: DuckDB inlines CTE references
  * by default, so a chain consumed by several downstream CTEs is re-evaluated
  * once per consumer — measured 487s for the `ar_features` oracle at sf0.01
  * (0.9s with hints), which blew the driver's correctness-gate budget in
  * rounds 1-2. Hints change evaluation strategy only, never results.
  */
object Oracle {
  /** A CTE header in any of the three syntactic positions: at line start,
    * directly after WITH [RECURSIVE], or inline after the previous CTE's
    * `), ` (the round-4 gap — such a CTE silently lost its hint). */
  private val CteHeader =
    "(?m)(^\\s*|WITH (?:RECURSIVE )?|\\)\\s*,\\s*)([A-Za-z_]\\w*) AS \\(".r

  /** True when the CTE body references its own name — the recursive-member
    * test. DuckDB rejects MATERIALIZED on recursive members; detecting them
    * structurally (instead of the round-3 hard-coded {thr, uthr, spthr} set)
    * keeps any future recursive CTE valid and any name reuse hinted. */
  private def isRecursive(sql: String, name: String, bodyStart: Int): Boolean = {
    // scan to the matching close paren; single-quoted literal contents are
    // blanked so a quoted occurrence of the CTE name is not counted as a
    // self-reference (and their parens don't unbalance the scan)
    val body = new StringBuilder
    var depth = 1
    var i = bodyStart
    var inStr = false
    while (i < sql.length && depth > 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; body += ' ' }
      else {
        c match {
          case '\'' => inStr = true
          case '('  => depth += 1
          case ')'  => depth -= 1
          case _    =>
        }
        if (depth > 0) body += (if (c == '\'') ' ' else c)
      }
      i += 1
    }
    ("(?<![\\w.])" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findFirstIn(body).isDefined
  }

  def materialize(sql: String): String =
    CteHeader.replaceAllIn(sql, m =>
      if (isRecursive(sql, m.group(2), m.end)) scala.util.matching.Regex.quoteReplacement(m.matched)
      else scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
}
