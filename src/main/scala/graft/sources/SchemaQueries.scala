package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-graded SCHEMA EVOLUTION read (the corpus-format reality at
  * 100 TB: epochs of parquet written months apart never share one
  * schema — a column added mid-crawl must read as null for the old
  * shards, without rewriting them).
  *
  * The query writes two parquet "epochs" of the documents table — epoch 1
  * without the `lang` column, epoch 2 with it — then reads both through
  * one `mergeSchema` scan. The oracle reconstructs the same union from
  * the original table, so a wrong merge (column dropped, misaligned, or
  * padded with the wrong value) breaks the hash.
  *
  * Scale note: `mergeSchema` reads every file's FOOTER at planning time
  * (not its data) — at fleet scale that is driver-side metadata work over
  * N files, the reason production tables keep an external schema registry
  * (or a table format's metadata log) once N reaches the millions. The
  * read path graded here is what any of those resolve to.
  */
object SchemaQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Per-PROCESS token in every tmp staging path: two concurrent JVMs
    * (bench and check over the same SF) must never overwrite each other's
    * fragmented/compacted dirs mid-read — the per-JVM memo caches only
    * serialize within one process. */
  private val procToken: String = ProcessHandle.current().pid().toString

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Bounded-tmp-growth discipline (round-13 advice): per-PID staging dirs
    * are written fresh by every JVM, so without cleanup repeated bench /
    * verify runs accumulate parquet copies in java.io.tmpdir indefinitely.
    * Two measures: (a) every dir this JVM creates is removed by a shutdown
    * hook; (b) on first staging use, stale `graft_*_p<pid>_*` dirs whose
    * owning process is GONE are swept (covers kill -9'd runs the hook
    * never saw). Live PIDs are never touched — and (round-14 advice) a
    * GONE verdict alone is not trusted either: in containers with hidepid
    * /proc (live PIDs invisible to ProcessHandle) a concurrent run's dirs
    * would read as orphaned mid-run, so the sweep additionally requires
    * the dir to be older than [[StaleSweepAgeMs]]. A dir that is both
    * PID-orphaned and a day old is safely dead under either failure mode
    * (PID reuse by an unrelated long-lived process keeps a dir at most
    * until its mtime ages past the bound on the next sweep). Age is the
    * MAX mtime across the dir TREE (round-15 advice): writes to files
    * inside a staging dir do not bump the top-level dir's mtime, so a
    * hidepid-concealed run alive past 24h would otherwise read as stale
    * while still writing. */
  private val ownDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val cleanupInit = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val StalePat = """graft_.*_p(\d+)_.*""".r
  private val StaleSweepAgeMs = 24L * 3600L * 1000L

  /** Newest mtime anywhere in the tree — the liveness signal the sweep
    * trusts (a parquet write touches leaf files, not the root dir). */
  private def newestMtime(f: java.io.File): Long =
    (f.lastModified() +:
      Option(f.listFiles()).getOrElse(Array.empty).map(newestMtime).toSeq).max
  private def initCleanup(): Unit =
    if (cleanupInit.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        ownDirs.forEach(d => deleteRecursively(new java.io.File(d)))))
      val cutoff = System.currentTimeMillis() - StaleSweepAgeMs
      Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty).foreach { f =>
          f.getName match {
            case StalePat(pid) if pid != procToken &&
                !ProcessHandle.of(pid.toLong).isPresent &&
                newestMtime(f) < cutoff =>
              deleteRecursively(f)
            case _ => ()
          }
        }
    }

  /** Staging dir for a dataset-keyed tmp layout, isolated per process and
    * registered for exit-time removal. */
  def stagingDir(prefix: String, d: String): String = {
    initCleanup()
    val dir = sys.props("java.io.tmpdir") + s"/${prefix}_p${procToken}_" +
      new java.io.File(d).getName
    ownDirs.add(dir)
    dir
  }

  private val partDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Day-partitioned copy of the events table in tmp, written ONCE per
    * JVM per dataset — a9 and a10 share the layout (the content is
    * identical and deterministic; writing it from each query doubled the
    * staging cost of every Verify run and plan sweep). */
  private def partitionedEvents(s: SparkSession, d: String): String = {
    val outDir = stagingDir("graft_part_events", d)
    partDirs.computeIfAbsent(outDir, _ => {
      import s.implicits._
      graft.Tables.events(s, d).withColumn("day", to_date($"ts"))
        .write.mode("overwrite").partitionBy("day").parquet(outDir)
      outDir
    })
  }

  /** a11 compaction dials: the fragmented "before" layout carries
    * [[CompactFragmentFiles]] files per day partition (a round-robin
    * repartition before the partitioned write — exactly how a
    * high-parallelism streaming ingest fragments a lake table), and the
    * OPTIMIZE pass bin-packs to at most ceil(rows/[[CompactMaxRecords]])
    * files per partition. Every harness SF's busiest day (3471 rows at
    * sf0.1) packs to ONE file. */
  val CompactFragmentFiles = 8
  val CompactMaxRecords = 4096L

  private val fragDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Deliberately FRAGMENTED day-partitioned events copy (written once per
    * JVM per dataset, like [[partitionedEvents]]). */
  private def fragmentedEvents(s: SparkSession, d: String): String = {
    val outDir = stagingDir("graft_a11_frag", d)
    fragDirs.computeIfAbsent(outDir, _ => {
      import s.implicits._
      graft.Tables.events(s, d).withColumn("day", to_date($"ts"))
        .repartition(CompactFragmentFiles)
        .write.mode("overwrite").partitionBy("day").parquet(outDir)
      outDir
    })
  }

  /** Parquet data files per `day=` partition directory — the metadata the
    * maintenance pass is judged on (driver-side listing; at fleet scale
    * this is the table format's manifest, never a data read). */
  def parquetFilesPerDay(dir: String): Map[String, Long] = {
    def ls(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).map(_.toSeq).getOrElse(
        sys.error(s"missing or unreadable staging directory: ${f.getPath}"))
    ls(new java.io.File(dir))
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .map(f => f.getName.stripPrefix("day=") ->
        ls(f).count(x => x.getName.endsWith(".parquet")).toLong)
      .toMap
  }

  val queries: Map[String, Q] = Map(
    // A11 — small-file COMPACTION (the OPTIMIZE/bin-pack maintenance pass
    // every 100 TB lake runs): rewrite a fragmented day-partitioned table
    // co-locating each partition's rows (one shuffle on the partition
    // key), bin-packed via maxRecordsPerFile; grade CONTENT equality per
    // partition (order-free xor signature over the row fields — file
    // layout must never change query results) and the FILE-COUNT bound
    // in-row: compact_ok compares the actual post-compaction file count
    // (driver manifest listing) against ceil(rows/target) and the
    // fragmented "before" count, so a regressed pass hash-mismatches the
    // oracle's literal TRUE. SourcesSpec pins the exact before/after
    // counts.
    "a11_compact" -> ((s, d) => {
      import s.implicits._
      val frag = fragmentedEvents(s, d)
      val outDir = stagingDir("graft_a11_compact", d)
      s.read.parquet(frag).repartition($"day")
        .write.mode("overwrite").partitionBy("day")
        .option("maxRecordsPerFile", CompactMaxRecords)
        .parquet(outDir)
      val before = parquetFilesPerDay(frag)
      val after = parquetFilesPerDay(outDir)
      val filesDf = after.toSeq.map { case (dayS, nAfter) =>
        (dayS, nAfter, before.getOrElse(dayS, 0L))
      }.toDF("day_s", "n_files_after", "n_files_before")
      s.read.parquet(outDir)
        .select($"day",
          concat_ws(":", $"event_id", graft.Det.us($"ts"), $"user_id",
            $"event_type").as("sig_s"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(cast(conv(substring(md5(sig_s), 1, 15), 16, 10) as bigint))")
            .as("content_sig"))
        .join(broadcast(filesDf), $"day".cast("string") === $"day_s")
        .select(graft.Det.dayI($"day").as("day_i"), $"n_rows", $"content_sig",
          ($"n_files_after" <=
            greatest(expr(s"(n_rows + ${CompactMaxRecords - 1}) div $CompactMaxRecords"), lit(1L)) &&
           $"n_files_after" <= $"n_files_before").as("compact_ok"))
    }),

    // A9 — PARTITIONED sink + pruned read-back: write events
    // hive-partitioned by day, read one day through the partition
    // directory layout. The scan must prune at PLANNING time
    // (PartitionFilters on the directory values — zero data files of the
    // other 29 days opened); PlanSpec locks that property. This is THE
    // layout decision that makes a 100 TB event table queryable: a date
    // predicate touches 1/30th of the data by construction.
    "a9_partitioned_sink" -> ((s, d) => {
      import s.implicits._
      s.read.parquet(partitionedEvents(s, d))
        .filter($"day" === lit("2024-01-15").cast("date"))
        .select($"event_id", $"user_id", $"event_type", $"value",
          graft.Det.us($"ts").as("t_us"))
    }),

    // A10 — DYNAMIC partition pruning: the probe day is not a literal but
    // computed FROM the data (the busiest signup day), so static pruning
    // is impossible — the optimizer must inject a dynamicpruning subquery
    // that evaluates the broadcast dim side first and prunes fact
    // partition directories at RUNTIME (PlanSpec locks the plan shape).
    // This is the mechanism that makes star-schema drill-downs touch one
    // partition of a 100 TB fact table when the predicate lives on the
    // dim side.
    "a10_dpp" -> ((s, d) => {
      import s.implicits._
      val fact = s.read.parquet(partitionedEvents(s, d))
      // busiest signup day: order-free argmax (min over (-n, day) structs)
      val peak = graft.Tables.events(s, d)
        .filter($"event_type" === "signup")
        .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
        .filter($"n" > 0)
        .agg(min(struct((-$"n").as("negn"), $"day".as("day"))).as("m"))
        .select($"m.day".as("day"))
      fact.join(broadcast(peak), Seq("day"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_events"), graft.Det.dsum($"value").as("sum_value"))
        .select(graft.Det.dayI($"day").as("day_i"), $"n_events", $"sum_value")
    }),

    "a8_schema_merge" -> ((s, d) => {
      import s.implicits._
      val outDir = sys.props("java.io.tmpdir") + "/graft_a8_merge_" +
        new java.io.File(d).getName
      val docs = graft.Tables.documents(s, d)
      docs.filter($"doc_id" % 2 === 0).select("doc_id", "text")
        .write.mode("overwrite").parquet(outDir + "/epoch1")
      docs.filter($"doc_id" % 2 =!= 0).select("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(outDir + "/epoch2")
      s.read.option("mergeSchema", "true")
        .parquet(outDir + "/epoch1", outDir + "/epoch2")
        .select($"doc_id", $"text", coalesce($"lang", lit("")).as("lang"))
    }))

  val oracleSql: Map[String, String] = Map(
    // content columns recomputed from the ORIGINAL table (layout must not
    // change content); compact_ok is the oracle's literal claim — the
    // Spark side computes it from the real file manifest, so a bin-pack
    // regression (more files than ceil(rows/target), or no reduction)
    // breaks the hash.
    "a11_compact" ->
      """SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(('0x' || substr(md5(concat_ws(':', event_id, epoch_us(ts), user_id, event_type)), 1, 15))::BIGINT) AS content_sig,
        |  TRUE AS compact_ok
        |FROM events GROUP BY 1""".stripMargin,

    "a9_partitioned_sink" ->
      """SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t_us
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin,

    "a10_dpp" ->
      """WITH sd AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |    FROM events WHERE event_type = 'signup' GROUP BY 1),
        |peak AS (SELECT day FROM sd ORDER BY n DESC, day LIMIT 1)
        |SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events e JOIN peak p ON CAST(e.ts AS DATE) = p.day
        |GROUP BY 1""".stripMargin,

    // the ELSE branch coalesces like the op does — a source row with NULL
    // lang must read as '' on both sides, not NULL-vs-'' mismatch
    "a8_schema_merge" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id % 2 = 0 THEN '' ELSE coalesce(lang, '') END AS lang
        |FROM documents""".stripMargin)
}
