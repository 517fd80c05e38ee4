package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{EventLogCsv, LogSchema}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("A3 csv.gz sink roundtrips through the A1 source") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/log"
    val df = Seq(
      ("Case1", "A", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "r1"),
      ("Case2", "B", "2024-01-02 10:00:00.123456", "2024-01-02 11:30:00", null))
      .toDF("case_id", "Activity", "start_time", "end_time", "Resource")
    EventLogCsv.writeCsvGz(df, out)
    val back = EventLogCsv.read(spark, out, LogSchema())
    assert(back.count() == 2L)
    val r = back.filter($"activity" === "B").collect()(0)
    assert(r.getAs[String]("resource") == "NOT_SET") // null fill
    assert(r.getAs[Long]("start_us") % 1000000L == 123456L) // us precision kept
    // event ids are file-order monotonic (ordering-only contract: distinct
    // and increasing with row position; values are partition-encoded)
    val ids = back.select("event_id").as[Long].collect().toSeq
    assert(ids.distinct.length == 2)
  }

  test("sharded sink: numFiles > 1 writes that many part files, same rows back") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_csv_sharded").toString + "/log"
    val df = spark.range(0L, 100L).select(
      concat(lit("Case"), $"id").as("case_id"), lit("A").as("Activity"),
      lit("2024-01-01 10:00:00").as("start_time"),
      lit("2024-01-01 11:00:00").as("end_time"), lit("r1").as("Resource"))
    EventLogCsv.writeCsvGz(df, out, numFiles = 4)
    val parts = new java.io.File(out).listFiles().count(_.getName.endsWith(".csv.gz"))
    assert(parts == 4, s"expected 4 shards, found $parts")
    val back = EventLogCsv.read(spark, out, LogSchema())
    assert(back.count() == 100L)
    assert(back.select("case_str").distinct().count() == 100L)
  }
}
