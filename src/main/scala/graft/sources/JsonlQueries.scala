package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-graded JSONL source/sink round trip (the lingua franca exchange
  * format of training-data pipelines — every corpus release ships as
  * sharded gzip JSONL).
  *
  * The query writes the `documents` table through Spark's JSON sink
  * (gzip, one shard per partition — the sink never coalesces, so a
  * 100 TB corpus writes with full parallelism), re-reads it with an
  * EXPLICIT schema, and emits the original grain. The oracle is the
  * ORIGINAL parquet table, so any escaping, encoding, numeric-rendering,
  * or compression defect in either direction breaks the hash.
  *
  * Schema-on-read is explicit by design: JSON inference costs a full
  * extra pass over the data (a second 100 TB scan) and types by sampling;
  * a production pipeline pins the schema. The inference path is separately
  * covered by SourcesSpec (small fixture, where the extra pass is free).
  */
object JsonlQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "a7_jsonl_roundtrip" -> ((s, d) => {
      val outDir = sys.props("java.io.tmpdir") + "/graft_a7_jsonl_" +
        new java.io.File(d).getName
      val docs = graft.Tables.documents(s, d)
      docs.write.mode("overwrite").option("compression", "gzip").json(outDir)
      s.read.schema(docs.schema).json(outDir)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }))

  val oracleSql: Map[String, String] = Map(
    "a7_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents")
}
