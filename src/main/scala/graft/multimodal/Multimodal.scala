package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media travel as opaque `binary` columns with typed metadata alongside —
  * the Spark-native layout for 100 TB multimodal corpora (content stays
  * columnar/compressed in parquet; metadata prunes without touching bytes).
  *
  * The decode step itself is a STUB: real image/audio codecs are not in this
  * container, so [[FakeCodec]] is a deterministic stand-in with the same
  * signature a JNI/FFI decoder would have (bytes → dimensions/format). The
  * Spark-side plumbing — schema, executor-side batch iteration via
  * mapPartitions, partition sizing — is real and tested; swapping in a true
  * codec changes only [[FakeCodec.decode]].
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte])
  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Long)

  /** STUB decoder — deterministic fake with a real decoder's shape.
    * A production build replaces this body with the actual codec call
    * (e.g. libjpeg/ffmpeg via FFI); everything downstream is unchanged. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val len = bytes.length
      val first: Int = if (len > 0) bytes(0) & 0xff else 0
      val last: Int = if (len > 0) bytes(len - 1) & 0xff else 0
      val width = 64 + ((len * 7 + first) % 577)
      val height = 64 + ((len * 13 + last) % 385)
      val format = (len % 3) match {
        case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
      }
      (width, height, format)
    }
  }

  /** Pack a text corpus into the multimodal layout (binary content +
    * metadata): the shape an image/audio corpus lands in. */
  def pack(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text"): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("content"))

  /** Executor-side batch decode: one codec instance per partition, streamed
    * over the partition's rows — the mapPartitions pattern a real decoder
    * (or a Pandas-UDF equivalent in PySpark) uses. No shuffle; parallelism =
    * input partitions. */
  def decodeMeta(df: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
    implicit val outEnc: Encoder[DecodedRow] = Encoders.product[DecodedRow]
    df.select(col("doc_id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        // per-partition codec init would go here (expensive native handle)
        it.map { r =>
          val (w, h, f) = FakeCodec.decode(r.content)
          DecodedRow(r.doc_id, w, h, f, r.content.length.toLong)
        }
      }.toDF()
  }

  /** Deterministic frame-sampling stub: pick `n` frame offsets from a fake
    * duration derived from content length — the video path's shape
    * (explode → per-frame rows). */
  def sampleFrames(df: DataFrame, n: Int = 4): DataFrame = {
    val duration = octet_length(col("content")) % 3600 + 1
    df.select(col("doc_id"), duration.as("duration_s"),
      explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("frame_offset_s",
        floor(col("frame_idx") * col("duration_s") / n).cast("int"))
  }
}
