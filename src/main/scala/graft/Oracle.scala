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
  /** Recursive CTE members cannot be MATERIALIZED in DuckDB. */
  private val RecursiveCtes = Set("thr", "uthr", "spthr")

  private val AtLineStart = "(?m)^(\\s*)([A-Za-z_]\\w*) AS \\(".r
  private val AfterWith = "(WITH (?:RECURSIVE )?)([A-Za-z_]\\w*) AS \\(".r

  def materialize(sql: String): String = {
    def sub(re: scala.util.matching.Regex, s: String): String =
      re.replaceAllIn(s, m =>
        if (RecursiveCtes(m.group(2))) scala.util.matching.Regex.quoteReplacement(m.matched)
        else scala.util.matching.Regex.quoteReplacement(
          s"${m.group(1)}${m.group(2)} AS MATERIALIZED ("))
    sub(AfterWith, sub(AtLineStart, sql))
  }
}
