package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-graded queries for the CSV source/sink surface (SURVEY §2 A1-A3).
  *
  * Until round 6 these rows rested on ScalaTest golden-replay evidence only
  * (the DuckDB gate ran on harness parquet, and the CSV logs live outside
  * it). DuckDB reads gzip CSV natively, so the ingest/parse/sink round trip
  * is orable-gatable after all: each query ingests the reference Production
  * log (main.py:14-16) through [[EventLogCsv]] and the oracle re-reads the
  * same file with `read_csv` — a header, compression, timestamp-parse, or
  * NOT_SET-fill defect breaks the hash.
  *
  * The queries ignore the sfDir argument (the reference log is the fixture;
  * it does not scale with SF) — constant work at every SF, ~70k rows max.
  *
  * Engine-internal derivations stay OUT of the compared schema: case_id is
  * an xxhash64 salt and event_id a partition-monotonic id, neither of which
  * DuckDB reproduces (and neither of which any cross-engine consumer should
  * depend on — the graded columns are the portable log grain).
  */
object CsvQueries {
  type Q = (SparkSession, String) => DataFrame

  val ProductionLog = "/root/reference/logs/Production.csv.gz"

  /** Canonical portable projection of an ingested log. */
  private def portable(log: DataFrame): DataFrame =
    log.select(col("case_str"), col("activity"), col("resource"),
      col("start_us"), col("end_us"))

  val queries: Map[String, Q] = Map(
    // A1 — gzip CSV scan with header + EventLogIDs column indirection
    // (config.py:14-42): canonical columns, epoch-micro timestamps.
    "a1_csv_ingest" -> ((s, _) => portable(EventLogCsv.read(s, ProductionLog))),

    // A2 — UTC timestamp discipline (discovery.py:227-232): the parsed
    // instants as TIMESTAMP_NTZ columns, not micros — grades the string →
    // timestamp mapping itself (a session-timezone leak would shift every
    // value; the oracle parses the same strings timezone-free).
    "a2_csv_utc_parse" -> ((s, _) => {
      val log = EventLogCsv.read(s, ProductionLog)
      log.select(col("case_str"), col("activity"),
        graft.Det.tsNtz(col("start_us")).as("start_ts"),
        graft.Det.tsNtz(col("end_us")).as("end_ts"))
    }),

    // A3 — gzip CSV SINK round trip: render the ingested log back to the
    // reference's column names and ISO format, write through the sink
    // (header + gzip, discovery.py:231-232), re-ingest the written
    // artifact, and emit the portable grain. The oracle is the ORIGINAL
    // file — any sink defect (quoting, header, compression, timestamp
    // rendering) surfaces as a hash break. Written to a per-dataset temp
    // dir; overwrite mode keeps the query idempotent.
    "a3_csv_roundtrip" -> ((s, _) => {
      val outDir = sys.props("java.io.tmpdir") + "/graft_a3_roundtrip"
      val rendered = EventLogCsv.read(s, ProductionLog).select(
        col("case_str").as("case_id"),
        date_format(graft.Det.tsNtz(col("start_us")), "yyyy-MM-dd'T'HH:mm:ss").as("start_time"),
        date_format(graft.Det.tsNtz(col("end_us")), "yyyy-MM-dd'T'HH:mm:ss").as("end_time"),
        col("activity").as("Activity"),
        col("resource").as("Resource"))
      EventLogCsv.writeCsvGz(rendered, outDir)
      portable(EventLogCsv.read(s, outDir))
    }))

  private val readCsv =
    s"read_csv('$ProductionLog', header=true)"

  val oracleSql: Map[String, String] = Map(
    "a1_csv_ingest" ->
      s"""SELECT case_id AS case_str, Activity AS activity,
         |  coalesce(Resource, 'NOT_SET') AS resource,
         |  epoch_us(start_time) AS start_us, epoch_us(end_time) AS end_us
         |FROM $readCsv""".stripMargin,

    "a2_csv_utc_parse" ->
      s"""SELECT case_id AS case_str, Activity AS activity,
         |  start_time AS start_ts, end_time AS end_ts
         |FROM $readCsv""".stripMargin,

    "a3_csv_roundtrip" ->
      s"""SELECT case_id AS case_str, Activity AS activity,
         |  coalesce(Resource, 'NOT_SET') AS resource,
         |  epoch_us(start_time) AS start_us, epoch_us(end_time) AS end_us
         |FROM $readCsv""".stripMargin)
}
