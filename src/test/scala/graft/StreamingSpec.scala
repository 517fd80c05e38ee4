package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Structured Streaming path: the tumbling aggregate over a parquet
  * readStream (memory sink, processAllAvailable) must agree with the batch
  * form of the same transform. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("island-detection sessions equal session_window sessions") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val a = StreamOps.sessions(e).collect().map(_.toString).sorted.toSeq
    val b = StreamOps.sessionsViaSessionWindow(e).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("mapGroupsWithState running counts match batch aggregation (streaming)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
    val expected = batch.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100d).cast("long")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val staged = java.nio.file.Files.createTempDirectory("graft_state").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$staged/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged)
    val q = StreamOps.runningUserCounts(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_state_test")
      .start()
    try {
      q.processAllAvailable()
      // latest state per user = final running totals
      val got = spark.sql(
        """SELECT user_id, max_by(n, n) AS n, max_by(sum_value_e2, n) AS s
          |FROM graft_state_test GROUP BY user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming tumbling counts equal batch tumbling counts") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
    val expected = StreamOps.tumbling(batch)
      .select($"win_start", $"event_type", $"n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap

    // readStream needs a directory source: stage the single parquet file
    val staged = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$staged/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged)
      .transform(Tables.normalizeTs)
    val q = StreamOps.tumblingStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT win_start, event_type, n FROM graft_stream_test")
        .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming sliding counts+sums equal batch sliding (overlapping windows)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
    val expected = StreamOps.sliding(batch)
      .collect().map(_.toString).sorted.toSeq

    val staged = java.nio.file.Files.createTempDirectory("graft_slide").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$staged/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged)
      .transform(Tables.normalizeTs)
    val q = StreamOps.slidingStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_slide_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("graft_slide_test")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming watermarked dedup equals batch distinct") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val expected = StreamOps.dedup(Tables.events(spark, dir))
      .collect().map(_.toString).sorted.toSeq

    val staged = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$staged/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged)
      .transform(Tables.normalizeTs)
    val q = StreamOps.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_test")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("graft_dedup_test")
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions equal batch island-detection sessions") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
    // batch sessions() emits sum_value as an exact 2-decimal double —
    // compare in cents, the typed operator's exact representation
    val expected = StreamOps.sessions(batch)
      .select($"user_id", graft.Det.us($"sess_start").as("s"),
        graft.Det.us($"sess_end").as("e"), $"n",
        round($"sum_value" * 100d).cast("long").as("cents"))
      .collect().map(_.toString).sorted.toSeq
    val got = StreamOps.sessionsViaFlatMapGroups(batch)
      .toDF("user_id", "s", "e", "n", "cents")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
  }

  test("flatMapGroupsWithState sessions on a stream emit only closed, consistent sessions") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchSessions = StreamOps.sessionsViaFlatMapGroups(Tables.events(spark, dir))
      .collect().map(s => (s.user_id, s.sess_start_us) -> s).toMap

    val staged = java.nio.file.Files.createTempDirectory("graft_fmg").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$staged/events.parquet"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged)
      .transform(Tables.normalizeTs)
    val q = StreamOps.sessionsViaFlatMapGroups(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_fmg_test")
      .start()
    try {
      q.processAllAvailable()
      // a single microbatch closes sessions whose successor event is in the
      // same batch; open sessions wait on the event-time timeout (watermark
      // driven) — everything emitted must match the batch result exactly
      val got = spark.table("graft_fmg_test").as[graft.streaming.SessionOut].collect()
      assert(got.nonEmpty, "stream emitted no closed sessions")
      got.foreach { s =>
        val b = batchSessions.get((s.user_id, s.sess_start_us))
        assert(b.contains(s), s"stream session $s disagrees with batch ${b.orNull}")
      }
    } finally q.stop()
  }
}
