package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness Parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read through here so that
  * scans stay columnar Parquet with Catalyst pushdown/pruning intact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped under three different Parquet physical encodings
    * across harness generations, so the loader dispatches on the dtype Spark
    * actually infers rather than assuming one:
    *
    *   - `TIMESTAMP(NANOS)`: Spark refuses the footer outright; we retry the
    *     read with `spark.sql.legacy.parquet.nanosAsLong` (set only on that
    *     retry path, never as an unconditional session side effect), then
    *     truncate ns->us — matching DuckDB's own ns->us truncation so oracle
    *     comparisons line up.
    *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)`: loads natively as
    *     TIMESTAMP_NTZ; pass through unchanged.
    *   - `TIMESTAMP(MICROS, isAdjustedToUTC=true)`: loads as TIMESTAMP
    *     (instant). A bare cast to NTZ would shift by the session timezone, so
    *     convert timezone-invariantly: `cast(ts as timestamp_ntz)` yields the
    *     session-tz wall clock, and the 2-arg `convert_timezone('UTC', ...)`
    *     re-interprets that wall clock in the session tz and re-renders it in
    *     UTC — net effect is the UTC wall clock of the instant regardless of
    *     `spark.sql.session.timeZone`.
    *
    * All three normalize to TIMESTAMP_NTZ carrying UTC wall-clock micros, like
    * every other harness timestamp column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$d/events.parquet"
    val raw =
      try s.read.parquet(path)
      catch {
        case e: Exception if String.valueOf(e.getMessage).contains("NANOS") =>
          // The conf is session-global, so set it only for the duration of
          // the retry's SCHEMA RESOLUTION and restore the prior value after:
          // left set, every later parquet read in the session would silently
          // load any TIMESTAMP(NANOS) column as long (a normalizeTs-unaware
          // call site would misread it). The analyzed schema is resolved
          // before the finally runs, and the scan re-reads footers per job
          // with the conf captured in its read options via the analyzed
          // relation, so restoring does not break later actions on `df`.
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prior = s.conf.getOption(key)
          s.conf.set(key, "true")
          try {
            val df = s.read.parquet(path)
            df.schema // force footer/schema resolution under the conf
            df
          } finally prior match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
      }
    normalizeTs(raw)
  }

  /** Normalize an events frame's `ts` column to TIMESTAMP_NTZ (UTC wall
    * clock) from whichever dtype the scan inferred — see [[events]] for the
    * per-encoding rationale. Shared by the batch loader and the streaming
    * readers (which stage their own file source but need identical ts
    * semantics). */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType =>
        raw
      case TimestampType =>
        raw.withColumn("ts", expr("convert_timezone('UTC', cast(ts as timestamp_ntz))"))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts dtype: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
