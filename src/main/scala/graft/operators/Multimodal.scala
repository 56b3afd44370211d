package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in partition-sized batches.
 *
 * Metadata extraction is REAL: [[ImageHeaders]] parses PNG/GIF/JPEG/BMP
 * container headers for format + pixel dimensions without any codec
 * library (dimension-from-header is how curation filters images by size
 * without paying for a decode). Full-pixel decode remains
 * deployment-specific — a payload that parses as no known container
 * reports a null format, never a fake. The Spark plumbing (the part
 * that has to survive 100 TB): `mapPartitions` processes rows in
 * partition batches with one codec context per partition (the Scala
 * analog of `mapInPandas` batches), and binary payloads never pass
 * through the driver.
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
      format: Option[String], width: Option[Int], height: Option[Int],
      ok: Boolean)

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
   * Feature extraction over media batches: one context per partition
   * (the MessageDigest instance here; a JNI codec handle in a pixel
   * deployment), rows streamed through it — never materialized
   * per-batch on the driver. `ok` = payload present; format/dims come
   * from the real container-header parse and are null for payloads
   * that are not a recognized image — no fabricated metadata.
   */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    val spark = media.sparkSession
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val meta = ImageHeaders.parse(r.content)
          md.reset()
          val checksum = md
            .digest(if (r.content == null) Array.emptyByteArray else r.content)
            .map("%02x".format(_)).mkString
          MediaFeatures(r.media_id, r.n_bytes, checksum,
            meta.map(_.format), meta.map(_.width), meta.map(_.height),
            ok = r.content != null && r.content.nonEmpty)
        }
      }
  }

  final case class AudioFeatures(
      media_id: Long, format: Option[String], channels: Option[Int],
      sample_rate: Option[Int], bits: Option[Int], data_bytes: Option[Long],
      duration_ms: Option[Long])

  /** Synthesize a canonical PCM WAV container per row from a text
    * payload (the payload bytes stand in for samples): the ingestion
    * shape for an audio corpus where the sandbox has no real media —
    * the CONTAINER is real ([[AudioHeaders.buildWav]]) and round-trips
    * through the parser. Channel count / sample rate derive
    * deterministically from the id so the metadata is non-trivial. */
  def synthWav(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { rows =>
        rows.map { case (id, p) =>
          val wav = AudioHeaders.buildWav(
            p.getBytes("UTF-8"),
            channels = (1 + id % 2).toInt,
            sampleRate = (8000 + (id % 5) * 2000).toInt)
          MediaRecord(id, wav, "audio/wav", wav.length.toLong)
        }
      }.toDF()
  }

  /** Audio metadata extraction over media batches — same partition-
    * batched shape as [[extractFeatures]], with the real RIFF header
    * parse; non-WAV payloads report all-null metadata, never a fake. */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = AudioHeaders.parse(r.content)
          AudioFeatures(r.media_id, meta.map(_.format), meta.map(_.channels),
            meta.map(_.sampleRate), meta.map(_.bitsPerSample),
            meta.map(_.dataBytes), meta.map(_.durationMs))
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
