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
}
