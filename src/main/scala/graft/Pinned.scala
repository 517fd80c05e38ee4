package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Session-scoped registry of persisted INTERMEDIATE DataFrames.
  *
  * Multi-consumer pipeline stages (batch discovery's segmentation frame,
  * dedup's shingle/minhash frames) persist so one action computes them once
  * — but the persists are plan-internal and the caller only sees the final
  * frame, so nothing ever unpersisted them. In a long-lived session (Bench,
  * the driver's gate, a notebook) those event-grain caches accumulated for
  * the session lifetime (round-3 verdict What's-wrong #1).
  *
  * `track` replaces the bare `.persist()` at those sites; `release` drops
  * every tracked cache for a session. Unpersisting is always safe — a block
  * evicted mid-job is recomputed from lineage — so harness code can call
  * `release` after every query action. Memoized STAGE caches (PmQueries
  * discCache) are deliberately not tracked: their lifecycle is the
  * dataset-switch eviction hook.
  */
object Pinned {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.Queue[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release. */
  def track(df: DataFrame): DataFrame = {
    reg.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df.persist()
  }

  /** Unpersist every tracked intermediate of `s` (non-blocking) and any
    * entries of already-stopped sessions. */
  def release(s: SparkSession): Unit = {
    reg.keySet.asScala.toList.filter(k => k == s || k.sparkContext.isStopped).foreach { k =>
      Option(reg.remove(k)).foreach { q =>
        if (!k.sparkContext.isStopped) q.asScala.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Count of live tracked intermediates for `s` (test hook). */
  def trackedCount(s: SparkSession): Int =
    Option(reg.get(s)).map(_.size).getOrElse(0)
}
