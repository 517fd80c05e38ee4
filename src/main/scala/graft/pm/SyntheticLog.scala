package graft.pm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic ground-truth generator — the reference's test strategy
  * (preprocessing/batch_injection.py:1-5: inject batches with known
  * properties, then require the pipeline to rediscover them). Deterministic,
  * no randomness. Each case runs A -> B -> C; every k consecutive cases
  * share one SIMULTANEOUS B-batch scheduled Mondays 09:00 on resource r0.
  */
object SyntheticLog {
  val day0Us: Long = 1704067200000000L // 2024-01-01 (a Monday) 00:00 UTC
  private val min = 60000000L

  /** @return canonical event-grain log (event_id, case_id, activity,
    *         resource, start_us, end_us) with nCases/k planted batches */
  def withParallelBatches(spark: SparkSession, nCases: Int, k: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until nCases).flatMap { i =>
      val batch = i / k
      val aStart = day0Us + i * 10 * min
      val aEnd = aStart + 5 * min
      val bStart = day0Us + batch.toLong * 7 * 86400000000L + 9 * 3600000000L
      val bEnd = bStart + 10 * min
      val cStart = bEnd + (i % k) * min
      Seq(
        (i * 3L + 0, i.toLong, "A", "ra", aStart, aEnd),
        (i * 3L + 1, i.toLong, "B", "r0", bStart, bEnd),
        (i * 3L + 2, i.toLong, "C", s"rc$i", cStart, cStart + 5 * min))
    }
    rows.toDF("event_id", "case_id", "activity", "resource", "start_us", "end_us")
  }

  /** Handoff base log for the prioritization harness
    * (handoff_batch.py:150-171 preconditions): m independent blocks, each
    * with a seamless-handoff chain G->H (H starts exactly when G ends, so
    * H.enabled == H.start) and a second case P->Q on another resource whose
    * Q runs on H's resource, is enabled strictly inside H's execution, and
    * starts exactly at H's end — the as-of prioritization candidate. */
  def handoffLog(spark: SparkSession, m: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until m).flatMap { j =>
      val t = day0Us + j.toLong * 3600000000L
      Seq(
        (j * 4L + 0, j * 2L, "G", s"rg$j", t - 5 * min, t),
        (j * 4L + 1, j * 2L, "H", s"rh$j", t, t + 10 * min),
        (j * 4L + 2, j * 2L + 1, "P", s"rp$j", t + 2 * min, t + 5 * min),
        (j * 4L + 3, j * 2L + 1, "Q", s"rh$j", t + 10 * min, t + 15 * min))
    }
    rows.toDF("event_id", "case_id", "activity", "resource", "start_us", "end_us")
  }
}
