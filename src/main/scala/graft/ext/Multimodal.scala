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

  /** Video-style frame sampling plumbing: a deterministic fake frame count
    * per payload (stub for container metadata), strided frame indices via
    * sequence+explode, and a per-frame md5-derived feature (stub for a real
    * frame decode). The explode/stride shape, schema, and per-frame feature
    * join surface are the real thing — swap the fake count/feature for a
    * codec call when the runtime has one. */
  def frameSample(docs: DataFrame, stride: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("payload", $"text".cast("binary"))
      .withColumn("n_frames", (length($"payload") % 24 + 1).cast("long"))
      .select($"doc_id", $"n_frames",
        explode(sequence(lit(0L), $"n_frames" - 1, lit(stride.toLong))).as("frame_idx"))
      .withColumn("frame_feature",
        conv(substring(md5(concat($"doc_id", lit(":"), $"frame_idx").cast("binary")), 1, 8), 16, 10)
          .cast("long"))
  }

  /** Aspect-preserving resize metadata (fit into a box x box frame):
    * fake source dims derived from the payload md5 (decode stub), target
    * dims in exact integer arithmetic — the metadata/bookkeeping half of a
    * resize operator, oracle-checkable; the pixel transform itself would
    * live in the decode kernel. */
  def resizeMeta(docs: DataFrame, box: Int = 224): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("payload", $"text".cast("binary"))
      .withColumn("src_w", (conv(substring(md5($"payload"), 1, 4), 16, 10) % 1920 + 1).cast("long"))
      .withColumn("src_h", (conv(substring(md5($"payload"), 5, 4), 16, 10) % 1080 + 1).cast("long"))
      .select($"doc_id", $"src_w", $"src_h",
        // integer floor division (div) keeps the arithmetic exact in both engines
        when($"src_w" >= $"src_h", lit(box.toLong))
          .otherwise(expr(s"src_w * $box div src_h")).cast("long").as("out_w"),
        when($"src_w" >= $"src_h", expr(s"src_h * $box div src_w"))
          .otherwise(lit(box.toLong)).cast("long").as("out_h"))
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
