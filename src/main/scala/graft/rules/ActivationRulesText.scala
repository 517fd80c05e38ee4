package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's human-readable activation-rules output
  * (preprocessing/main.py:29-42 + the gate notices printed by
  * activation_rules.py:185-187), e.g. outputs/Production_ActivationRules.txt:
  *
  *   Not extracting rules from batch ('Turning',) due to low size: 2
  *
  *   Batch: ('Lapping',):
  *       # Observations: 141
  *       Confidence: 0.94
  *       Support: 0.12
  *       [[hour_of_day=4.0-5.0]]
  *
  *   Batch: ('Laser Marking',): No rules could match the specified criterion (support >= 0.1).
  *
  * Skip notices come first (the reference prints them while grouping),
  * then one block per gated group in key order. Driver-side by design —
  * the grouped feature table is tiny (same posture as EP2 rendering).
  */
object ActivationRulesText {
  private def pyFloat(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) s"${v.toLong}.0" else v.toString
  private def pyInt(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** The engine's feature columns carry explicit units (micros); the
    * reference's rules text renders the parsed features table
    * (activation_rules.py:161-163: durations in SECONDS, column `minute`).
    * Map names and scale thresholds so the layout matches the reference's
    * schema exactly. */
  private val refNames = Map(
    "t_ready_us" -> ("t_ready", 1e6), "t_waiting_us" -> ("t_waiting", 1e6),
    "t_max_flow_us" -> ("t_max_flow", 1e6), "instant_us" -> ("instant", 1e6),
    "minute_of_hour" -> ("minute", 1d))
  private def toRef(c: Cond): Cond = refNames.get(c.feature) match {
    case Some((n, s)) => Cond(n, c.isLeq, c.threshold / s)
    case None => c
  }

  /** Reference condition styles (wittgenstein's rendering after main.py's
    * replace chain): `f=<v` / `f=>v` for one-sided bounds, `f=a-b` for an
    * interval (a >= and <= pair on the same feature), `f=v` for equality. */
  private def renderConds(conds0: List[Cond]): String = {
    val conds = conds0.map(toRef)
    val byFeature = conds.zipWithIndex.groupBy(_._1.feature).toSeq
      .sortBy(_._2.map(_._2).min) // keep first-appearance order
    byFeature.map { case (f, cs) =>
      val lows = cs.map(_._1).filter(!_.isLeq).map(_.threshold)
      val highs = cs.map(_._1).filter(_.isLeq).map(_.threshold)
      (lows.maxOption, highs.minOption) match {
        case (Some(lo), Some(hi)) if lo == hi => s"$f=${pyInt(lo)}"
        case (Some(lo), Some(hi)) => s"$f=${pyFloat(lo)}-${pyFloat(hi)}"
        case (Some(lo), None) => s"$f=>${pyFloat(lo)}"
        case (None, Some(hi)) => s"$f=<${pyFloat(hi)}"
        case (None, None) => f
      }
    }.mkString(" ^ ")
  }

  private def renderRuleset(rs: RuleSet): String =
    rs.rules.map(r => "[" + renderConds(r.conds) + "]")
      .mkString("[", " V\n\t", "]")

  /** Python-tuple key rendering: ('A',) / ('A', 'B') for a comma-joined
    * activities key. */
  private def tupleKey(key: String): String = {
    val parts = key.split(",", -1).toSeq
    if (parts.length == 1) s"('${parts.head}',)"
    else parts.map(p => s"'$p'").mkString("(", ", ", ")")
  }

  def render(features: DataFrame, groupCol: String = "activities",
             maxRules: Int = Ripper.defaultMaxRules,
             minRuleSupport: Double = Ripper.defaultMinRuleSupport): String = {
    val featCols = Ripper.featCols
    val rows = features
      .select(col(groupCol).cast("string") +: col("outcome").cast("int") +:
        featCols.map(c => col(c).cast("double")): _*)
      .collect()
    val groups = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    val sb = new StringBuilder
    val gated = groups.flatMap { case (key, rs) =>
      if (rs.length <= 30) {
        sb.append(s"Not extracting rules from batch ${tupleKey(key)} due to low size: ${rs.length}\n")
        None
      } else {
        val data = rs.map { r =>
          (featCols.indices.map(i => r.getDouble(i + 2)).toArray, r.getInt(1))
        }
        if (data.map(_._2).distinct.length < 2) {
          sb.append(s"Not extracting rules from batch ${tupleKey(key)} due to only one outcome in training!\n")
          None
        } else Some(key -> Ripper.fit(data, featCols, maxRules, minRuleSupport))
      }
    }
    gated.foreach {
      case (key, Some(rs)) =>
        sb.append("\n\nBatch: %s:\n\t# Observations: %d\n\tConfidence: %.2f\n\tSupport: %.2f\n\t%s".format(
          tupleKey(key), rs.numObs, rs.confidence, rs.support, renderRuleset(rs)))
      case (key, None) =>
        sb.append(s"\n\nBatch: ${tupleKey(key)}: No rules could match the specified criterion (support >= $minRuleSupport).")
    }
    sb.toString
  }
}
