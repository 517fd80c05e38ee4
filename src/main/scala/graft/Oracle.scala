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
  private val AtLineStart = "(?m)^(\\s*)([A-Za-z_]\\w*) AS \\(".r
  private val AfterWith = "(WITH (?:RECURSIVE )?)([A-Za-z_]\\w*) AS \\(".r

  /** True when the CTE body references its own name — the recursive-member
    * test. DuckDB rejects MATERIALIZED on recursive members; detecting them
    * structurally (instead of the round-3 hard-coded {thr, uthr, spthr} set)
    * keeps any future recursive CTE valid and any name reuse hinted. */
  private def isRecursive(sql: String, name: String, bodyStart: Int): Boolean = {
    // scan to the matching close paren, skipping single-quoted literals
    var depth = 1
    var i = bodyStart
    var inStr = false
    while (i < sql.length && depth > 0) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case _    =>
      }
      i += 1
    }
    val body = sql.substring(bodyStart, math.max(bodyStart, i - 1))
    ("(?<![\\w.])" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findFirstIn(body).isDefined
  }

  def materialize(sql: String): String = {
    def sub(re: scala.util.matching.Regex, s: String): String =
      re.replaceAllIn(s, m =>
        if (isRecursive(s, m.group(2), m.end)) scala.util.matching.Regex.quoteReplacement(m.matched)
        else scala.util.matching.Regex.quoteReplacement(
          s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
    sub(AfterWith, sub(AtLineStart, sql))
  }
}
