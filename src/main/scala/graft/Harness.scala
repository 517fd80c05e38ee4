package graft

import org.apache.spark.sql.SparkSession

/** Shared harness-session tuning (NOT engine semantics). */
object Harness {
  /** Point shuffle/spill files at tmpfs when the host has one: jstack
    * sampling showed executor threads spending most RUNNABLE time in
    * FileOutputStream.open0 — shuffle-file creation on the overlay disk
    * dominated the staged pm pipeline (-18% on pm_sp_batches at sf0.1
    * from this alone). A cluster provisions NVMe local dirs; /dev/shm is
    * the single-box analogue. No-op when /dev/shm is absent or the caller
    * already set spark.local.dir. */
  def tmpfsLocalDir(b: SparkSession.Builder): SparkSession.Builder = {
    // run.sh may have set -Dspark.local.dir already; prune whichever
    // tmpfs-resident dir is in effect either way
    sys.props.get("spark.local.dir") match {
      case Some(d) if d.startsWith("/dev/shm/") =>
        pruneStale(new java.io.File(d)); b
      case Some(_) => b
      case None if new java.io.File("/dev/shm").isDirectory =>
        pruneStale(new java.io.File("/dev/shm/spark-local"))
        b.config("spark.local.dir", "/dev/shm/spark-local")
      case None => b
    }
  }

  /** Shuffle dirs on tmpfs cost RAM, and a SIGKILL'd JVM never removes
    * its spark-<uuid> subdir. Graceful exits clean after themselves, so
    * anything old here is orphaned; the age guard keeps concurrently
    * running sessions' dirs safe. Liveness is the NEWEST mtime found
    * anywhere under the dir, not the root's: a long-running session's
    * spark-<uuid> root keeps its startup mtime while its shuffle files
    * stay fresh — pruning on the root mtime alone would delete a live
    * session's shuffle data out from under it (fetch failures). */
  private def pruneStale(root: java.io.File, maxAgeMs: Long = 6L * 3600 * 1000): Unit =
    try {
      val cutoff = System.currentTimeMillis() - maxAgeMs
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && newestMtime(d) < cutoff)
        .foreach(deleteRec)
    } catch { case _: Throwable => () }

  private def newestMtime(f: java.io.File): Long = {
    val own = f.lastModified()
    if (!f.isDirectory) own
    else Option(f.listFiles()).getOrElse(Array.empty)
      .foldLeft(own)((m, c) => math.max(m, newestMtime(c)))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
