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
  def tmpfsLocalDir(b: SparkSession.Builder): SparkSession.Builder =
    if (new java.io.File("/dev/shm").isDirectory &&
        !sys.props.contains("spark.local.dir"))
      b.config("spark.local.dir", "/dev/shm/spark-local")
    else b
}
