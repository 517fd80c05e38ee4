package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Standing tripwire for the scale invariants `graft.ScaleProbe` measures
  * at sf0.1x10 (SCALE_PROBE.json): a fast sf0.001 x4 version that runs in
  * `sbt test`, so a code change that introduces a quadratic join shape or
  * blows the LSH bucket cap under inflation is caught at commit time, not
  * at the next manual probe run. Wall-clock ratios are deliberately NOT
  * asserted here (CI boxes are noisy); the probe's committed artifact
  * carries the timing evidence.
  */
class ScaleInvariantSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"
  private val factor = 4

  test("near-dup pipeline under inflation: no quadratic joins, bucket cap holds") {
    import spark.implicits._
    val docs = ScaleProbe.inflatedDocs(Tables.documents(spark, dir), factor)
    val pairs = ext.Dedup.nearDupPairs(docs)
    assert(pairs.count() > 0)
    val (quad, _) = ScaleProbe.joinCounts(pairs)
    assert(quad == 0, s"quadratic join shape in inflated nearDupPairs plan ($quad)")
    val maxBucket = ext.Dedup.bandBucketSizes(docs).agg(max($"cnt")).head.getLong(0)
    assert(maxBucket <= ext.Dedup.BucketCap,
      s"band bucket $maxBucket exceeds cap ${ext.Dedup.BucketCap} at ${factor}x")
    Pinned.release(spark)
  }

  test("inflated docs preserve the near-dup rate and isolate copies") {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
    val n1 = ext.Dedup.nearDupPairs(base)
      .filter($"jaccard" >= ext.Dedup.NearDupGroupJaccard).count()
    val stride = base.agg(max($"doc_id")).head.getLong(0) + 1
    val pf = ext.Dedup.nearDupPairs(ScaleProbe.inflatedDocs(base, factor))
      .filter($"jaccard" >= ext.Dedup.NearDupGroupJaccard)
    // zero cross-copy pairs: token renaming is bijective per copy, so every
    // verified pair stays inside one copy's id stripe
    val cross = pf.filter($"doc_a".divide(stride).cast("long") =!=
      $"doc_b".divide(stride).cast("long")).count()
    assert(cross == 0, s"$cross cross-copy near-dup pairs leaked")
    // and the per-copy rate matches the base corpus exactly (bijective
    // token rename preserves shingle-set relations; LSH uses the same
    // md5 seeds on different strings, so allow the candidate-sampling
    // wobble of +-30% around factor * base)
    val nf = pf.count()
    assert(nf >= (factor * n1 * 7) / 10 && nf <= (factor * n1 * 13) / 10,
      s"inflated verified-pair count $nf vs base $n1 x $factor")
    Pinned.release(spark)
  }

  test("pm discovery under inflation: copies are independent periods") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val log1 = pm.EventLogOps.fromEventsDf(ev)
    val logF = pm.EventLogOps.fromEventsDf(ScaleProbe.inflatedEvents(ev, factor))
    val d1 = pm.BatchDiscovery.discover(
      pm.EnabledTime.withEnabled(log1).transform(Pinned.track))
    val dF = pm.BatchDiscovery.discover(
      pm.EnabledTime.withEnabled(logF).transform(Pinned.track))
    val (quad, _) = ScaleProbe.joinCounts(dF)
    val batched1 = d1.filter($"batch_id".isNotNull).count()
    val batchedF = dF.filter($"batch_id".isNotNull).count()
    assert(dF.count() == factor * d1.count())
    // identical batch structure per copy: the +31-day shift preserves every
    // within-copy interval relation, and copies cannot co-batch (disjoint
    // resources x time)
    assert(batchedF == factor * batched1,
      s"batched events $batchedF != $factor x $batched1")
    assert(quad == 0, s"quadratic join shape in inflated discovery plan ($quad)")
    Pinned.release(spark)
  }
}
