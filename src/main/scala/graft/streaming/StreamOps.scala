package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-shaped aggregations (SURVEY §2 I). Each transform
  * works identically on a batch DataFrame and on a readStream source; the
  * streaming path adds a watermark. Batch mode is what the correctness gate
  * exercises; the streaming path is covered by ScalaTest with a memory sink.
  */
object StreamOps {
  /** Tumbling 1h window counts per event_type. */
  def tumbling(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.Det.dsum($"value").as("sum_value"))
      .select($"w.start".cast("timestamp_ntz").as("win_start"), $"event_type", $"n", $"sum_value")
  }

  /** Sliding 1h window, 30min slide. */
  def sliding(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), graft.Det.dsum($"value").as("sum_value"))
      .select($"w.start".cast("timestamp_ntz").as("win_start"), $"event_type", $"n", $"sum_value")
  }

  /** Per-user session windows with a 10min inactivity gap. */
  def sessions(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy($"user_id", session_window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum($"value").as("sum_value"))
      .select($"user_id",
        $"w.start".cast("timestamp_ntz").as("sess_start"),
        $"w.end".cast("timestamp_ntz").as("sess_end"),
        $"n", $"sum_value")
  }

  /** Streaming variant of [[tumbling]] with a watermark, for a readStream
    * source (tested via the memory sink). */
  def tumblingStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", $"ts".cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".cast("timestamp_ntz").as("win_start"), $"event_type", $"n")
  }
}
