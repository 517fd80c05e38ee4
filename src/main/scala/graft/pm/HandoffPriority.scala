package graft.pm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prioritization/handoff harness (preprocessing/handoff_batch.py:150-237):
  * plant forced-prioritization pairs into a log, then verify the planted
  * 1-second enabled-to-predecessor-start gap survives a fresh enabled-time
  * estimation. The reference does this with per-pair pandas trace clones;
  * here both the pair finder (the D5 as-of shape) and the clone/displace
  * pass are set-based joins, and the invariant check returns a violations
  * DataFrame instead of printing.
  */
object HandoffPriority {
  private val SecUs = 1000000L

  /** Prioritization candidates (handoff_batch.py:161-171): e1 of the given
    * activity with enabled == start (seamless handoff), e2 = the first
    * same-resource event with enabled inside (e1.enabled, e1.end) and
    * start == e1.end. "First" is the reference's iloc[0] made total:
    * (start_us, end_us, event_id). One pair per e1, indexed i in e1 order. */
  def prioritizationPairs(en: DataFrame, activity: String): DataFrame = {
    import en.sparkSession.implicits._
    val e1 = en.filter($"activity" === activity && $"enabled_us" === $"start_us")
      .select($"event_id".as("e1_id"), $"case_id".as("e1_case"), $"resource",
        $"start_us".as("e1_start"), $"end_us".as("e1_end"), $"enabled_us".as("e1_enabled"))
    val e2 = en.select($"event_id".as("e2_id"), $"case_id".as("e2_case"), $"resource",
      $"activity".as("e2_activity"), $"start_us".as("e2_start"),
      $"end_us".as("e2_end"), $"enabled_us".as("e2_enabled"))
    e1.join(e2, Seq("resource"))
      .filter($"e2_enabled" > $"e1_enabled" && $"e2_enabled" < $"e1_end" &&
        $"e2_start" === $"e1_end")
      .withColumn("rn", row_number().over(Window.partitionBy($"e1_id")
        .orderBy($"e2_start", $"e2_end", $"e2_id")))
      .filter($"rn" === 1).drop("rn")
      .withColumn("i", row_number().over(
        Window.orderBy($"e1_start", $"e1_end", $"e1_id")).cast("long") - 1)
  }

  /** Clone both traces of every pair under fresh case ids and a
    * "_prior_<i>"-suffixed resource; pull e2's start back to its enabled
    * time and displace e1's trace so e1 runs right after the prioritized
    * e2 (handoff_batch.py:177-211). The enabling event of e1 (end ==
    * e1.enabled) is stretched to 1s before e2's enabled time — that 1s gap
    * is the planted invariant. */
  def injectPrioritizedHandoff(log: DataFrame, activity: String): DataFrame = {
    import log.sparkSession.implicits._
    val en = EnabledTime.withEnabled(log)
    // STAGE boundary (tiny pair-grain frame): t1 and t2 each embed this
    // plan, and the union is re-analyzed by every downstream consumer —
    // un-cut, the nested self-join lineage (pairs contains the enabled-time
    // kernel twice) made Catalyst re-analysis the dominant cost of the
    // prioritization suite (minutes of driver CPU on a 24-row log). The
    // function is already eager (max-id .first() below), so an eager leaf
    // here changes nothing semantically.
    val pairs = graft.Pinned.stage(prioritizationPairs(en, activity)
      .withColumn("diff", $"e2_end" - $"e1_start")
      .withColumn("en_shift", $"e2_enabled" - $"e1_enabled" - lit(SecUs)))
    val mx = log.agg(max($"case_id"), max($"event_id")).first()
    val (maxCase, maxEvent) = (mx.getLong(0), mx.getLong(1))
    val t1 = log.join(pairs.select($"e1_case".as("case_id"), $"i",
        $"e1_start", $"e1_enabled", $"diff", $"en_shift"), Seq("case_id"))
      .select(
        ($"event_id" + (lit(maxEvent) + 1) * ($"i" * 2 + 1)).as("event_id"),
        (lit(maxCase) + $"i" * 2 + 1).as("case_id"),
        $"activity",
        concat($"resource", lit("_prior_"), $"i").as("resource"),
        when($"start_us" >= $"e1_start", $"start_us" + $"diff").otherwise($"start_us").as("start_us"),
        when($"end_us" === $"e1_enabled", $"end_us" + $"en_shift")
          .when($"end_us" > $"e1_start", $"end_us" + $"diff")
          .otherwise($"end_us").as("end_us"))
    val t2 = log.join(pairs.select($"e2_case".as("case_id"), $"i",
        $"e2_activity", $"e2_start", $"e2_end", $"e2_enabled"), Seq("case_id"))
      .select(
        ($"event_id" + (lit(maxEvent) + 1) * ($"i" * 2 + 2)).as("event_id"),
        (lit(maxCase) + $"i" * 2 + 2).as("case_id"),
        $"activity",
        concat($"resource", lit("_prior_"), $"i").as("resource"),
        when($"start_us" === $"e2_start" && $"end_us" === $"e2_end" &&
          $"activity" === $"e2_activity", $"e2_enabled").otherwise($"start_us").as("start_us"),
        $"end_us")
    val cols = Seq("event_id", "case_id", "activity", "resource", "start_us", "end_us")
    log.select(cols.map(col): _*)
      .unionByName(t1.select(cols.map(col): _*))
      .unionByName(t2.select(cols.map(col): _*))
  }

  /** The reference's `_check_priorit` (handoff_batch.py:218-237) as a
    * violations query over the injected clones: every waiting clone event
    * must have a same-resource predecessor ending exactly at its start,
    * whose start is exactly 1s after the waiter's enabled time. Empty
    * result == invariant holds. */
  def checkPrioritization(injected: DataFrame): DataFrame = {
    import injected.sparkSession.implicits._
    // stage: the re-estimated frame is self-joined below (waiting x others)
    // — without the cut both sides re-embed the caller's full injected
    // lineage plus the enabled-time kernel
    val en = graft.Pinned.stage(EnabledTime.withEnabled(injected))
    val waiting = en.filter($"start_us" > $"enabled_us" && $"resource".contains("_prior_"))
      .select($"event_id", $"resource".as("w_res"), $"start_us", $"enabled_us")
    val others = en.select($"resource".as("o_res"), $"end_us".as("o_end"),
      $"start_us".as("o_start"), $"event_id".as("o_id"))
    // left join on (resource, end == start): a waiter with NO matching
    // predecessor is itself a violation (o_start null)
    waiting.join(others, $"w_res" === $"o_res" && $"o_end" === $"start_us", "left")
      .withColumn("rn", row_number().over(Window.partitionBy($"event_id")
        .orderBy($"o_start", $"o_id")))
      .filter($"rn" === 1)
      .filter($"o_start".isNull || $"o_start" - $"enabled_us" =!= SecUs)
      .select($"event_id", $"w_res".as("resource"), $"enabled_us", $"start_us", $"o_start")
  }
}
