package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in partition-sized batches.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * codecs — see `DecodeStub`); everything around it — schema, batch
 * iteration, partition sizing, metadata extraction — is real and tested.
 * On a cluster the stub body is replaced by the codec call; the Spark
 * plumbing (the part that has to survive 100 TB) is unchanged:
 * `mapPartitions` processes rows in partition batches with one codec
 * context per partition (the Scala analog of `mapInPandas` batches), and
 * binary payloads never pass through the driver.
 */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  final case class MediaRecord(
      media_id: Long, content: Array[Byte], mime_type: String, n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, checksum: String,
      width: Int, height: Int, ok: Boolean)

  /** Wrap a text table as opaque binary media (UTF-8 payloads) — the
    * ingestion shape for any media source: (id, bytes, mime, size). */
  def asBinaryColumn(df: DataFrame, idCol: String, payloadCol: String,
      mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      lit(mime).as("mime_type"),
      octet_length(col(payloadCol)).cast(LongType).as("n_bytes"))

  /**
   * The decode stub: deterministic fake "decode" standing in for an
   * image/audio codec. Real deployments swap the body for e.g. a JNI
   * codec call; signature and batching stay identical.
   */
  object DecodeStub {
    /** Fake decode: derives stable pseudo-dimensions from the payload. */
    def decode(content: Array[Byte]): (Int, Int, Boolean) = {
      if (content == null || content.isEmpty) (0, 0, false)
      else {
        // stand-in for codec output: dimensions derived deterministically
        val h = java.util.Arrays.hashCode(content)
        (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1, true)
      }
    }
  }

  /**
   * Feature extraction over media batches: one codec context per
   * partition, rows streamed through it (never materialized per-batch
   * on the driver). Output is a typed Dataset.
   */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    val spark = media.sparkSession
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        // per-partition "codec context" init happens here (stub: none)
        rows.map { r =>
          val (w, h, ok) = DecodeStub.decode(r.content)
          val checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(if (r.content == null) Array.emptyByteArray else r.content)
            .map("%02x".format(_)).mkString
          MediaFeatures(r.media_id, r.n_bytes, checksum, w, h, ok)
        }
      }
  }

  /** Frame-sample stand-in: pick every `stride`-th chunk of the payload —
    * the batch/offset arithmetic of video frame sampling, minus codecs. */
  def sampleChunks(media: DataFrame, chunkSize: Int = 1024, stride: Int = 4): DataFrame =
    media.select(col("media_id"), col("content"),
        ceil(col("n_bytes").cast(DoubleType) / chunkSize).cast(LongType).as("n_chunks"))
      .withColumn("sampled_chunk_idx",
        filter(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0))),
          i => i % stride === 0))
      .select(col("media_id"), col("n_chunks"), size(col("sampled_chunk_idx")).as("n_sampled"))
}
