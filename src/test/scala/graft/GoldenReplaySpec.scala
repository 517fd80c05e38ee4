package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pm.{BatchDiscovery, EnabledTime, WaitingTimes}
import graft.sources.{EventLogCsv, LogSchema}

/** Golden replay against the reference's own logs (SURVEY §5): run the full
  * EP1 pipeline on Production.csv.gz and check structural anchors. Exact
  * instance counts depend on BAMA-internal semantics (subprocess batches
  * not yet reimplemented), so round-1 asserts invariants + sane magnitude
  * and prints the observed numbers for round-over-round tracking.
  */
class GoldenReplaySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("EP1 on Production.csv.gz: events preserved, batches found, invariants hold") {
    import spark.implicits._
    val log = EventLogCsv.read(spark, "/root/reference/logs/Production.csv.gz")
    assert(log.count() == 4503L) // BASELINE.md dataset scale
    assert(log.select("case_id").distinct().count() == 225L)

    val en = EnabledTime.withEnabled(
      log.select($"event_id", $"case_id", $"activity", $"resource", $"start_us", $"end_us"))
    // enabled time never exceeds start
    assert(en.filter($"enabled_us" > $"start_us").count() == 0L)

    val d = BatchDiscovery.discoverFull(en).persist()
    val nBatches = d.filter($"batch_id".isNotNull).select("batch_id").distinct().count()
    val batchedEvents = d.filter($"batch_id".isNotNull).count()
    info(s"Production: $nBatches batch instances, $batchedEvents/4503 batched events (golden: 485 instances)")
    // Round-2 typed-link segmentation reproduces all 485 golden instances
    // exactly, plus one extra 2-case pair the reference's subprocess
    // nullification path removes (our enabled-time oracle reconstruction may
    // shift a couple of W4 splits vs the reference's, hence the +/-2 band).
    assert(nBatches >= 484L && nBatches <= 488L,
      s"batch instance count $nBatches drifted from the golden 485 (expected ~486)")
    assert(d.count() == 4503L)

    // per-batch invariants
    val sizes = d.filter($"batch_id".isNotNull)
      .groupBy("batch_id").agg(countDistinct($"case_id").as("n"))
    assert(sizes.filter($"n" < 2).count() == 0L)

    val wt = WaitingTimes.batchCaseWT(d)
    assert(wt.filter($"total_wt_us" =!=
      $"creation_wt_us" + $"ready_wt_us" + $"other_wt_us").count() == 0L)
    assert(wt.filter($"ready_wt_us" < 0 || $"creation_wt_us" < 0 || $"other_wt_us" < 0).count() == 0L)
    d.unpersist()
  }

  test("WTs artifact layout matches the golden Production_WTs.csv.gz") {
    import spark.implicits._
    val log = EventLogCsv.read(spark, "/root/reference/logs/Production.csv.gz")
    val view = graft.pm.Ep1.wtLogView(graft.pm.Ep1.analyze(log)).persist()
    val golden = spark.read.option("header", "true")
      .csv("/root/reference/outputs/Production_WTs.csv.gz").persist()
    // exact reference column order (FIXTURES.md §2)
    assert(view.columns.toSeq == golden.columns.toSeq)
    assert(view.count() == 4503L)
    // timestamp and duration renderings are byte-identical on the identity
    // columns (independent of batch-discovery deltas): every (case,
    // activity, start, end, resource) 5-tuple matches the golden file
    val key = Seq("case_id", "Activity", "start_time", "end_time", "Resource")
    assert(view.select(key.map(col): _*).except(golden.select(key.map(col): _*)).count() == 0L)
    // duration strings parse in the golden "D days HH:MM:SS[.ffffff]" shape
    val durRe = "^\\d+ days \\d{2}:\\d{2}:\\d{2}(\\.\\d{6})?$"
    assert(view.filter(!$"batch_pt".rlike(durRe) || !$"batch_ready_wt".rlike(durRe)).count() == 0L)
    view.unpersist(); golden.unpersist()
  }

  test("EP1 on Loan_Application_batched.csv.gz: scale anchors + full discovery") {
    import spark.implicits._
    // cleanActivity: the Loan goldens were produced through the handoff
    // preprocessing, which strips/normalizes activity names
    // (handoff_batch.py:83) — ' Assess loan risk' -> 'Assess loan risk'
    val log = EventLogCsv.read(spark, "/root/reference/logs/Loan_Application_batched.csv.gz",
      LogSchema(enabled = Some("enabled_time"), cleanActivity = true))
    assert(log.count() == 70162L)
    assert(log.select("case_id").distinct().count() == 7000L)
    // precomputed enabled times: never after start (reference guarantees)
    assert(log.filter($"enabled_us" > $"start_us").count() == 0L)

    // The Loan golden was produced with min_batch_instance_size=10 (the
    // commented config in preprocessing/main.py; every golden instance has
    // >= 10 cases). The reference recomputes enabled times with its oracle
    // (the input column differs from the golden's on ~90% of rows), so we
    // do the same with K2 and allow a small band around the golden 587.
    val en = EnabledTime.withEnabled(
      log.select($"event_id", $"case_id", $"activity", $"resource", $"start_us", $"end_us"))
    val d = BatchDiscovery.discoverFull(en, minSize = 10).persist()
    val nBatches = d.filter($"batch_id".isNotNull).select("batch_id").distinct().count()
    info(s"Loan: $nBatches batch instances at minSize=10 (golden: 587)")
    assert(nBatches >= 575L && nBatches <= 600L,
      s"batch instance count $nBatches drifted from the golden 587")

    // EP2 report anchors for 'Assess loan risk' (Loan_Application_Report.txt
    // lines 1-5): 7000 occurrences, ~5264 batched (75.20%), all sizes 14.
    val report = graft.pm.Reporting.render(d)
    val block = report.split("Batch formed by activities: ")
      .find(_.startsWith("('Assess loan risk',)")).getOrElse("")
    assert(block.contains("Num occurrences: 7000"))
    val batched = "Num occurrences in batch: (\\d+)".r
      .findFirstMatchIn(block).map(_.group(1).toLong).getOrElse(0L)
    info(s"Loan 'Assess loan risk': $batched batched occurrences (golden: 5264)")
    assert(math.abs(batched - 5264L) <= 30L,
      s"batched occurrences $batched drifted from golden 5264")
    assert(block.contains("Batch size distribution: Counter({14: "),
      "golden batches are all size 14")
    d.unpersist()
  }
}
