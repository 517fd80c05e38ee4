package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pm.{EnabledTime, HandoffPriority, SyntheticLog}

/** Port of the reference prioritization harness checks
  * (handoff_batch.py:163-237): pair discovery preconditions, the planted
  * 1-second gap invariant, and a negative control. */
class HandoffPrioritySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("finds one prioritization pair per handoff block") {
    val log = SyntheticLog.handoffLog(spark, 3)
    val en = EnabledTime.withEnabled(log)
    val pairs = HandoffPriority.prioritizationPairs(en, "H").collect()
    assert(pairs.length == 3)
    assert(pairs.map(_.getAs[Long]("i")).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("injected log passes _check_priorit: planted 1s gaps survive re-estimation") {
    val log = SyntheticLog.handoffLog(spark, 3)
    // stage: every assertion below re-estimates enabled times over this
    // frame — plan against a leaf, not the union-of-clone-joins lineage
    val injected = graft.Pinned.stage(HandoffPriority.injectPrioritizedHandoff(log, "H"))
    // 3 blocks x 2 cloned traces x 2 events on top of the 12 base events
    assert(injected.count() == 12 + 3 * 4)
    import spark.implicits._
    // the prioritized clone starts at its enabled time (no waiting)
    val en = EnabledTime.withEnabled(injected)
    val qClones = en.filter($"activity" === "Q" && $"resource".contains("_prior_")).collect()
    assert(qClones.length == 3)
    assert(qClones.forall(r => r.getAs[Long]("start_us") == r.getAs[Long]("enabled_us")))
    // the displaced clone waits, and the invariant checker finds no violation
    val hClones = en.filter($"activity" === "H" && $"resource".contains("_prior_")).collect()
    assert(hClones.forall(r => r.getAs[Long]("start_us") > r.getAs[Long]("enabled_us")))
    assert(HandoffPriority.checkPrioritization(injected).isEmpty)
  }

  test("checker flags a corrupted gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val log = SyntheticLog.handoffLog(spark, 2)
    val injected = graft.Pinned.stage(HandoffPriority.injectPrioritizedHandoff(log, "H"))
    // widen one planted gap by a second: the G-clone end moves back
    val corrupted = injected.withColumn("end_us",
      when($"activity" === "G" && $"resource" === "rg0_prior_0",
        $"end_us" - 1000000L).otherwise($"end_us"))
    assert(HandoffPriority.checkPrioritization(corrupted).count() == 1)
  }
}
