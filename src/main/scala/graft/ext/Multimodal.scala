package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY J5): media payloads as opaque
  * BinaryType columns with typed metadata alongside. The decode step is a
  * STUB (image/audio codecs are not in this container): `decodeStub`
  * computes a deterministic fake feature from the bytes, but the schema,
  * batched per-partition execution shape (the Scala analog of
  * mapInPandas), and partitioning are the real thing.
  */
object Multimodal {
  /** Attach a binary payload + metadata columns (expression form, codegen). */
  def withPayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("payload", $"text".cast("binary"))
      .select($"doc_id",
        length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("payload_md5"),
        conv(substring(md5($"payload"), 1, 4), 16, 10).cast("long").as("stub_feature"))
  }

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("fake_width", LongType),
    StructField("fake_height", LongType)))

  /** Batched per-partition "decode": iterates payload batches exactly like a
    * mapInPandas UDF would — one partition in, one iterator of feature rows
    * out, no driver involvement. Replace the body with a real codec when
    * the runtime has one. */
  def decodeStub(docsWithPayload: DataFrame): DataFrame = {
    val spark = docsWithPayload.sparkSession
    val rdd = docsWithPayload.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // deterministic fake decode: pretend bytes are a (w, h) image
        val w = (bytes.length % 64) + 1
        Row(id, bytes.length.toLong, w.toLong, (bytes.length / w + 1).toLong)
      }
    }
    spark.createDataFrame(rdd, featSchema)
  }
}
