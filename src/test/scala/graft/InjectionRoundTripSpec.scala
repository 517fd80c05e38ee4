package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pm.{BatchDiscovery, EnabledTime, Reporting, SyntheticLog}
import graft.rules.{Features, Ripper}

/** Inject-then-rediscover round trip (the reference's own test strategy,
  * preprocessing/batch_injection.py): plant Monday-09:00 simultaneous
  * batches of known size and require the full pipeline — enabled times,
  * discovery, features, rules — to recover them. */
class InjectionRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  // 15 batches -> ~45 feature rows, above the reference's >30 gate
  private val nCases = 120
  private val k = 8

  private lazy val disc = {
    val log = SyntheticLog.withParallelBatches(spark, nCases, k)
    // stage (leaf), not persist: featuresTable references this frame ~6
    // times and Catalyst re-analyzes each reference's full subtree per
    // action — over the un-cut discovery plan that re-walk is the
    // dominant cost of this suite (planning cost is data-independent)
    graft.Pinned.stage(BatchDiscovery.discover(EnabledTime.withEnabled(log)))
  }

  test("discovery recovers exactly the planted batches") {
    import spark.implicits._
    val b = disc.filter($"activity" === "B")
    assert(b.filter($"batch_id".isNull).count() == 0L)
    val stats = b.groupBy($"batch_id", $"batch_type")
      .agg(countDistinct($"case_id").as("sz")).collect()
    assert(stats.length == nCases / k)
    assert(stats.forall(_.getAs[String]("batch_type") == "Parallel"))
    assert(stats.forall(_.getAs[Long]("sz") == k.toLong))
    // nothing else batched
    assert(disc.filter($"activity" =!= "B" && $"batch_id".isNotNull).count() == 0L)
  }

  test("activation rules recover the planted Monday-09:00 trigger") {
    val feats = Features.featuresTable(disc)
    val ruleSets = Ripper.fitPerGroup(feats)
    assert(ruleSets.contains("B"), s"expected rules for B, got ${ruleSets.keySet}")
    val rs = ruleSets("B")
    assert(rs.confidence >= 0.9, s"confidence ${rs.confidence}")
    // the separating features are the schedule (dow/hour) and/or full queue
    val used = rs.rules.flatMap(_.conds.map(_.feature)).toSet
    assert(used.intersect(Set("day_of_week", "hour_of_day", "minute_of_hour",
      "num_queue", "t_ready_us")).nonEmpty,
      s"rule uses unexpected features: ${rs.render}")
  }

  test("report renderer emits the reference's structure") {
    val text = Reporting.render(disc)
    assert(text.contains("Batch formed by activities: ('B',)"))
    assert(text.contains(s"\tNum occurrences: $nCases"))
    assert(text.contains(s"\tNum occurrences in batch: $nCases"))
    assert(text.contains("Frequency occurrences in batch: 100.00%"))
    assert(text.contains(s"Batch size distribution: Counter({$k: ${nCases / k}})"))
    assert(text.contains("- Batch type: Parallel"))
    assert(text.contains("CTE: "))
    assert(text.contains("Average ready wt: "))
  }
}
