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

  val queries: Map[String, Q] = Map(
    // A9 — PARTITIONED sink + pruned read-back: write events
    // hive-partitioned by day, read one day through the partition
    // directory layout. The scan must prune at PLANNING time
    // (PartitionFilters on the directory values — zero data files of the
    // other 29 days opened); PlanSpec locks that property. This is THE
    // layout decision that makes a 100 TB event table queryable: a date
    // predicate touches 1/30th of the data by construction.
    "a9_partitioned_sink" -> ((s, d) => {
      import s.implicits._
      val outDir = sys.props("java.io.tmpdir") + "/graft_a9_part_" +
        new java.io.File(d).getName
      val ev = graft.Tables.events(s, d).withColumn("day", to_date($"ts"))
      ev.write.mode("overwrite").partitionBy("day").parquet(outDir)
      s.read.parquet(outDir)
        .filter($"day" === lit("2024-01-15").cast("date"))
        .select($"event_id", $"user_id", $"event_type", $"value",
          graft.Det.us($"ts").as("t_us"))
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
    "a9_partitioned_sink" ->
      """SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t_us
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin,

    "a8_schema_merge" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id % 2 = 0 THEN '' ELSE lang END AS lang
        |FROM documents""".stripMargin)
}
