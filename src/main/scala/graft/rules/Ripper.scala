package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One numeric condition `feature <= t` / `feature >= t`. */
case class Cond(feature: String, isLeq: Boolean, threshold: Double) {
  def matches(v: Double): Boolean = if (isLeq) v <= threshold else v >= threshold
  def render: String = s"$feature${if (isLeq) "<=" else ">="}${if (threshold == threshold.floor) threshold.toLong.toString else threshold.toString}"
  def toColumn: Column = if (isLeq) col(feature) <= threshold else col(feature) >= threshold
  /** ANSI SQL form of the condition; Double.toString ("123.0" / "1.7E15")
    * parses as a DOUBLE literal in DuckDB, matching the Column promotion. */
  def toSql: String = s"$feature ${if (isLeq) "<=" else ">="} $threshold"
}

/** Conjunction of conditions. */
case class Rule(conds: List[Cond]) {
  def matches(row: Array[Double], idx: Map[String, Int]): Boolean =
    conds.forall(c => c.matches(row(idx(c.feature))))
  def render: String = conds.map(_.render).mkString(" ^ ")
  def toColumn: Column = conds.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
  def toSql: String =
    if (conds.isEmpty) "TRUE" else conds.map(_.toSql).mkString("(", " AND ", ")")
}

/** Disjunction of rules + scores (reference rules dict shape:
  * activation_rules.py:233-238). */
case class RuleSet(rules: List[Rule], numObs: Long, confidence: Double, support: Double) {
  def render: String = rules.map(r => s"[${r.render}]").mkString(" v ")
  def toColumn: Column = rules.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))
  /** The induced predicate as SQL — the H2 scoring oracle recomputes
    * num_obs/confidence/support over the feature pipeline in DuckDB with
    * exactly this text. */
  def toSql: String =
    if (rules.isEmpty) "FALSE" else rules.map(_.toSql).mkString("(", " OR ", ")")
}

/** H1 — RIPPER-style sequential covering, reimplemented natively and
  * deterministically (the reference drives `wittgenstein.RIPPER` at
  * activation_rules.py:190-240; same outer loop: grow one rule at a time,
  * keep it if support >= minRuleSupport on the full group, drop covered
  * rows, stop at maxRules). Rule growth is greedy FOIL gain over <=/>=
  * threshold conditions on the numeric features. Driver-side by design —
  * feature groups are provably tiny (one row per instance x ~3 instants);
  * scoring at scale happens distributed via RuleSet.toColumn (H2).
  */
object Ripper {
  val defaultMaxRules = 3
  val defaultMinRuleSupport = 0.1
  private val maxConds = 3

  def fit(rows: Array[(Array[Double], Int)], features: Array[String],
          maxRules: Int = defaultMaxRules,
          minRuleSupport: Double = defaultMinRuleSupport): Option[RuleSet] = {
    val n = rows.length
    if (n == 0) return None
    val idx = features.zipWithIndex.toMap
    var remaining = rows
    var rules = List.empty[Rule]
    var continue = true
    while (continue && rules.size < maxRules) {
      growRule(remaining, features) match {
        case Some(rule) =>
          val coveredTp = remaining.count { case (r, y) => rule.matches(r, idx) && y == 1 }
          if (coveredTp.toDouble / n >= minRuleSupport) {
            rules = rules :+ rule
            remaining = remaining.filterNot { case (r, _) => rule.matches(r, idx) }
            if (remaining.isEmpty || !remaining.exists(_._2 == 1)) continue = false
          } else continue = false
        case None => continue = false
      }
    }
    if (rules.isEmpty) None
    else {
      val pred = rows.map { case (r, _) => rules.exists(_.matches(r, idx)) }
      val tp = rows.zip(pred).count { case ((_, y), p) => p && y == 1 }
      val pp = pred.count(identity)
      Some(RuleSet(rules, n.toLong,
        if (pp == 0) 0d else tp.toDouble / pp, tp.toDouble / n))
    }
  }

  /** Greedy growth: repeatedly add the condition with best FOIL gain until
    * the rule is pure, gain vanishes, or maxConds is reached. Deterministic
    * tie-break: (gain, feature name, op, threshold).
    *
    * Per feature the rows are sorted ONCE and prefix sums give (p1, n1) for
    * every <=/>= threshold in O(1) — the round-1 version re-scanned the
    * covered set per candidate (64 thresholds x 2 ops x features x rows).
    * Candidate set, evaluation order, and gain arithmetic are unchanged, so
    * the induced rules are identical. */
  private def growRule(data: Array[(Array[Double], Int)], features: Array[String]): Option[Rule] = {
    if (!data.exists(_._2 == 1)) return None
    var covered = data
    var conds = List.empty[Cond]
    var done = false
    while (!done && conds.size < maxConds) {
      val p0 = covered.count(_._2 == 1).toDouble
      val n0 = covered.length - p0
      if (p0 == 0 || n0 == 0) done = true
      else {
        var best: Option[(Double, Cond)] = None
        var fi = 0
        while (fi < features.length) {
          // sorted distinct values with cumulative pos/neg counts (v <= dv(j))
          val sorted = covered.sortBy(_._1(fi))
          val m = sorted.length
          val dv = Array.newBuilder[Double]
          val cp = Array.newBuilder[Double]
          val cn = Array.newBuilder[Double]
          var i = 0; var pAcc = 0d; var nAcc = 0d
          while (i < m) {
            val v = sorted(i)._1(fi)
            if (sorted(i)._2 == 1) pAcc += 1 else nAcc += 1
            if (i == m - 1 || sorted(i + 1)._1(fi) != v) { dv += v; cp += pAcc; cn += nAcc }
            i += 1
          }
          val dvA = dv.result(); val cpA = cp.result(); val cnA = cn.result()
          val nd = dvA.length
          // cap candidate thresholds at 64 per feature (deterministic stride
          // over the sorted distinct values) so growth stays bounded even on
          // large groups
          val idxs = if (nd <= 64) Array.range(0, nd)
                     else Array.tabulate(64)(k => k * nd / 64)
          var vi = 0
          while (vi < idxs.length) {
            val j = idxs(vi)
            val t = dvA(j)
            var leq = 0
            while (leq < 2) {
              // <= t covers the prefix; >= t covers the suffix (total - prefix below)
              val (p1, n1) =
                if (leq == 0) (cpA(j), cnA(j))
                else (pAcc - (if (j == 0) 0d else cpA(j - 1)),
                      nAcc - (if (j == 0) 0d else cnA(j - 1)))
              if (p1 > 0) {
                val c = Cond(features(fi), leq == 0, t)
                val gain = p1 * (log2(p1 / (p1 + n1)) - log2(p0 / (p0 + n0)))
                val better = best match {
                  case None => gain > 1e-9
                  case Some((bg, bc)) => gain > bg + 1e-12 ||
                    (math.abs(gain - bg) <= 1e-12 &&
                      (c.feature, if (c.isLeq) 0 else 1, c.threshold)
                        .toString < (bc.feature, if (bc.isLeq) 0 else 1, bc.threshold).toString)
                }
                if (better) best = Some((gain, c))
              }
              leq += 1
            }
            vi += 1
          }
          fi += 1
        }
        best match {
          case Some((_, c)) =>
            conds = conds :+ c
            covered = covered.filter { case (r, _) => c.matches(r(features.indexOf(c.feature))) }
          case None => done = true
        }
      }
    }
    if (conds.isEmpty) None else Some(Rule(conds))
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2d)

  /** The engineered feature columns (activation_rules.py:134-150). */
  val featCols: Array[String] = Array("instant_us", "num_queue", "t_ready_us",
    "t_waiting_us", "t_max_flow_us", "day_of_week", "day_of_month",
    "hour_of_day", "minute_of_hour", "workload")

  /** H3 — fit per group (PER_BATCH mode: group = activities key), with the
    * reference's gates (>30 rows, both outcomes — activation_rules.py:179-188).
    * Collects only the tiny feature table to the driver; groups fit in
    * parallel (fit is row-order-insensitive, so results are deterministic).
    * The distributed form is RuleQueries.rulesDf (groupByKey.mapGroups). */
  def fitPerGroup(features: DataFrame,
                  groupCol: String = "activities",
                  maxRules: Int = defaultMaxRules,
                  minRuleSupport: Double = defaultMinRuleSupport): Map[String, RuleSet] =
    fitPerGroupAll(features, groupCol, maxRules, minRuleSupport)
      .collect { case (k, Some(rs)) => k -> rs }

  /** Like fitPerGroup, but keeps gate-passed groups whose fit found no
    * surviving ruleset as `None` (the reference records these with an empty
    * rules dict, activation_rules.py:240) — the scoring oracle needs the
    * full gate-passed group list to be stable across scales. */
  def fitPerGroupAll(features: DataFrame,
                     groupCol: String = "activities",
                     maxRules: Int = defaultMaxRules,
                     minRuleSupport: Double = defaultMinRuleSupport): Map[String, Option[RuleSet]] = {
    import scala.collection.parallel.CollectionConverters._
    val rows = features
      .select(col(groupCol) +: col("outcome") +: featCols.map(c => col(c).cast("double")): _*)
      .collect()
    rows.groupBy(_.getString(0))
      .filter(_._2.length > 30)
      .par
      .flatMap { case (key, rs) =>
        val data = rs.map { r =>
          (featCols.indices.map(i => r.getDouble(i + 2)).toArray, r.getAs[Number](1).intValue())
        }
        if (data.map(_._2).distinct.length < 2) None
        else Some(key -> fit(data, featCols, maxRules, minRuleSupport))
      }
      .seq.toMap
  }
}
