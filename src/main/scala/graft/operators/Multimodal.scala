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

  final case class VideoFeatures(
      media_id: Long, brand: Option[String], timescale: Option[Long],
      duration_ticks: Option[Long], duration_ms: Option[Long],
      n_tracks: Option[Int], handler: Option[String], mdat_bytes: Option[Long])

  final case class TiffFeatures(
      media_id: Long, byte_order: Option[String], width: Option[Long],
      height: Option[Long], orientation: Option[Int],
      bits_per_sample: Option[Int], xres_num: Option[Long],
      xres_den: Option[Long])

  /** Synthesize a canonical TIFF/EXIF container per row: dimensions,
    * orientation, resolution, and byte order all derive
    * deterministically from the id ([[TiffHeaders.buildTiff]]); every
    * other file is big-endian so BOTH byte orders are exercised
    * in-corpus. The scan-side dual of [[synthMp4]]. */
  def synthTiff(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType))
      .as(Encoders.scalaLong)
      .mapPartitions { rows =>
        rows.map { id =>
          val tiff = TiffHeaders.buildTiff(
            width = 16 + (id % 8).toInt * 16,
            height = 16 + (id % 5).toInt * 32,
            orientation = 1 + (id % 8).toInt,
            xres = 72 + (id % 3).toInt * 72,
            littleEndian = id % 2 == 0)
          MediaRecord(id, tiff, "image/tiff", tiff.length.toLong)
        }
      }.toDF()
  }

  /** TIFF metadata extraction — per-partition kernel over the real IFD
    * walk; non-TIFF payloads report all-null metadata, never a fake. */
  def extractTiffFeatures(media: DataFrame): Dataset[TiffFeatures] = {
    implicit val enc: Encoder[TiffFeatures] = Encoders.product[TiffFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = TiffHeaders.parse(r.content)
          TiffFeatures(r.media_id, meta.map(_.byteOrder), meta.map(_.width),
            meta.map(_.height), meta.map(_.orientation),
            meta.map(_.bitsPerSample), meta.map(_.xResNum),
            meta.map(_.xResDen))
        }
      }
  }

  final case class WebpFeatures(
      media_id: Long, format: Option[String], width: Option[Long],
      height: Option[Long], has_alpha: Option[Boolean],
      n_frames: Option[Int], loop_count: Option[Int],
      riff_bytes: Option[Long])

  /** Synthesize a canonical WebP (RIFF) container per row, cycling
    * through all three variants — lossy `VP8 `, lossless `VP8L`, and
    * extended animated `VP8X`/`ANIM`/`ANMF` — so every dimension
    * encoding the parser supports is exercised in-corpus
    * ([[WebpHeaders]]). The web-image sibling of [[synthTiff]]. */
  def synthWebp(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType))
      .as(Encoders.scalaLong)
      .mapPartitions { rows =>
        rows.map { id =>
          val w = 16 + (id % 7).toInt * 48
          val h = 16 + (id % 9).toInt * 32
          val webp = (id % 3) match {
            case 0 => WebpHeaders.buildLossy(w, h, (id % 50).toInt, id)
            case 1 => WebpHeaders.buildLossless(w, h, id % 2 == 0,
              (id % 50).toInt, id)
            case _ => WebpHeaders.buildAnimated(w, h, id % 2 == 0,
              1 + (id % 4).toInt, (id % 5).toInt, id)
          }
          MediaRecord(id, webp, "image/webp", webp.length.toLong)
        }
      }.toDF()
  }

  /** WebP metadata extraction — per-partition kernel over the real
    * RIFF chunk walk; non-WebP payloads report all-null metadata,
    * never a fake. */
  def extractWebpFeatures(media: DataFrame): Dataset[WebpFeatures] = {
    implicit val enc: Encoder[WebpFeatures] = Encoders.product[WebpFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = WebpHeaders.parse(r.content)
          WebpFeatures(r.media_id, meta.map(_.format), meta.map(_.width),
            meta.map(_.height), meta.map(_.hasAlpha), meta.map(_.nFrames),
            meta.map(_.loopCount), meta.map(_.riffBytes))
        }
      }
  }

  final case class PdfFeatures(
      media_id: Long, version: Option[String], n_objects: Option[Int],
      n_pages: Option[Int], box_w: Option[Int], box_h: Option[Int],
      title: Option[String], offsets_valid: Option[Boolean])

  final case class ZipFeatures(
      media_id: Long, n_entries: Option[Int], total_bytes: Option[Long],
      crc_mismatches: Option[Int], offsets_valid: Option[Boolean])

  /** Synthesize a canonical classic-xref PDF per row: version, page
    * count, media box, and title all derive deterministically from the
    * id ([[PdfHeaders.buildPdf]]). The document-container sibling of
    * [[synthTiff]]/[[synthWebp]]. */
  def synthPdf(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType))
      .as(Encoders.scalaLong)
      .mapPartitions { rows =>
        rows.map { id =>
          val (w, h) = (id % 3) match {
            case 0 => (612, 792) // US letter
            case 1 => (595, 842) // A4
            case _ => (420, 595) // A5
          }
          val pdf = PdfHeaders.buildPdf(
            version = if (id % 2 == 0) "1.4" else "1.7",
            nPages = 1 + (id % 5).toInt,
            boxWidth = w, boxHeight = h,
            title = s"doc-$id")
          MediaRecord(id, pdf, "application/pdf", pdf.length.toLong)
        }
      }.toDF()
  }

  /** PDF metadata extraction — per-partition kernel over the real
    * xref walk; non-PDF payloads report all-null metadata, never a
    * fake. */
  def extractPdfFeatures(media: DataFrame): Dataset[PdfFeatures] = {
    implicit val enc: Encoder[PdfFeatures] = Encoders.product[PdfFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = PdfHeaders.parse(r.content)
          PdfFeatures(r.media_id, meta.map(_.version), meta.map(_.nObjects),
            meta.map(_.nPages), meta.map(_.boxWidth), meta.map(_.boxHeight),
            meta.map(_.title), meta.map(_.offsetsValid))
        }
      }
  }

  /** Synthesize a STORED-method ZIP archive per row: entry count,
    * names, and payload lengths derive deterministically from the id
    * ([[ZipHeaders.buildZip]]); payload bytes come from the same
    * seeded formula the oracle replays by length only (CRC integrity
    * is checked ON the bytes, not recomputed by the oracle). */
  def synthZip(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType))
      .as(Encoders.scalaLong)
      .mapPartitions { rows =>
        rows.map { id =>
          val entries = (0 until (1 + (id % 4)).toInt).map { j =>
            val len = 10 + ((id + j) % 50).toInt
            val data = Array.tabulate(len)(i => ((id * 31 + j * 17 + i) & 0xFF).toByte)
            (s"f$j.txt", data)
          }
          val zip = ZipHeaders.buildZip(entries)
          MediaRecord(id, zip, "application/zip", zip.length.toLong)
        }
      }.toDF()
  }

  /** ZIP manifest extraction with CRC verification — per-partition
    * kernel over the central-directory walk; non-ZIP payloads report
    * all-null metadata, never a fake. */
  def extractZipFeatures(media: DataFrame): Dataset[ZipFeatures] = {
    implicit val enc: Encoder[ZipFeatures] = Encoders.product[ZipFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = ZipHeaders.parse(r.content)
          ZipFeatures(r.media_id, meta.map(_.nEntries), meta.map(_.totalBytes),
            meta.map(_.crcMismatches), meta.map(_.offsetsValid))
        }
      }
  }

  /** Synthesize a canonical ISO-BMFF (MP4) container per row from a
    * text payload (payload bytes stand in for the mdat media stream):
    * the video analog of [[synthWav]] — the CONTAINER is real
    * ([[Mp4Headers.buildMp4]], ftyp/moov/mvhd/trak/mdia/hdlr/mdat) and
    * round-trips through the recursive box parser. Timescale, duration
    * ticks, and the track handler type derive deterministically from
    * the id; every 5th file writes its mdat in the 64-bit largesize
    * form so the largesize path is exercised in-corpus. */
  def synthMp4(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { rows =>
        rows.map { case (id, p) =>
          val data = p.getBytes("UTF-8")
          val mp4 = Mp4Headers.buildMp4(
            data,
            timescale = Seq(600, 1000, 12288, 44100)((id % 4).toInt),
            durationTicks = data.length.toLong * 25 + id % 7,
            handler = if (id % 3 == 0) "soun" else "vide",
            largeMdat = id % 5 == 0)
          MediaRecord(id, mp4, "video/mp4", mp4.length.toLong)
        }
      }.toDF()
  }

  /** Video-container metadata extraction — same partition-streamed
    * shape as [[extractAudioFeatures]], with the real recursive box
    * walk; non-BMFF payloads report all-null metadata, never a fake. */
  def extractVideoFeatures(media: DataFrame): Dataset[VideoFeatures] = {
    implicit val enc: Encoder[VideoFeatures] = Encoders.product[VideoFeatures]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = Mp4Headers.parse(r.content)
          VideoFeatures(r.media_id, meta.map(_.brand), meta.map(_.timescale),
            meta.map(_.durationTicks), meta.map(_.durationMs),
            meta.map(_.nTracks), meta.flatMap(_.handlers.headOption),
            meta.map(_.mdatBytes))
        }
      }
  }

  // ----------------------------------------------------------------
  // REAL pixel/sample decode paths (ImageCodec / AudioHeaders.pcm16).
  // The synth builders write genuine binary containers from a
  // deterministic formula; the extract side decodes the BINARY (never
  // the formula), so a DuckDB oracle recomputing the formula gates the
  // whole encode→compress→decode→measure loop end-to-end.
  // ----------------------------------------------------------------

  /** splitmix64 finalizer — the published mixing constants; used as the
    * deterministic noise source for synthetic pixel content. */
  private[operators] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One REAL PNG per row: 8-bit gray, w = 24+(id%4)·8, h = 16+(id%3)·8,
    * pixel g(x,y) = (A·x + B·y + C) mod 256 with A = 1+id%7, B = 2+id%5,
    * C = id%256 — a linear gradient the oracle can re-derive per pixel.
    * The encoder cycles scanline filters (y mod 5), so decoding this
    * corpus exercises every PNG defilter branch. */
  def synthPng(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (24 + (id % 4) * 8).toInt
          val h = (16 + (id % 3) * 8).toInt
          val a = (1 + id % 7).toInt; val b = (2 + id % 5).toInt
          val c = (id % 256).toInt
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = ((a * x + b * y + c) % 256).toByte
              x += 1
            }
            y += 1
          }
          val png = ImageCodec.encodePng(ImageCodec.RawImage(w, h, 1, px))
          MediaRecord(id, png, "image/png", png.length.toLong)
        }
      }.toDF()
  }

  /** One REAL baseline JPEG per row: solid gray value v = (37·id+11)
    * mod 256 at w = 13+(id%5)·7, h = 9+(id%3)·8 (non-multiples of 8 —
    * the edge-clamped partial-MCU path), quality ∈ {50, 75, 90} by id
    * mod 3. Solid blocks are DC-only, so the decode is EXACTLY the
    * quantization round-trip px' = clamp(round(round(8·(v−128)/Q0)
    * ·Q0/8)+128, 0, 255) with Q0 ∈ {16, 8, 3} — the q179 oracle
    * recomputes it per row in SQL. */
  def synthJpeg(df: DataFrame, idCol: String): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (13 + (id % 5) * 7).toInt
          val h = (9 + (id % 3) * 8).toInt
          val v = ((37 * id + 11) % 256).toInt
          val quality = Seq(50, 75, 90)((id % 3).toInt)
          val px = Array.fill(w * h)(v.toByte)
          val jpeg = JpegCodec.encodeJpeg(
            ImageCodec.RawImage(w, h, 1, px), quality)
          MediaRecord(id, jpeg, "image/jpeg", jpeg.length.toLong)
        }
      }.toDF()
  }

  /** Mixed-container dedup corpus: rows with the same content class
    * (id mod `classes`) hold IDENTICAL 32×32 pixels, but alternate the
    * CONTAINER by copy index — PNG for even (id/classes), baseline
    * JPEG (quality 75) for odd. Content is a 4×4 grid of solid 8×8
    * blocks (two tones per class); the on/off pattern per class is a
    * NON-CONSTANT first-order Reed–Muller RM(1,4) codeword — 30 of
    * them over the 16 blocks, pairwise Hamming distance ≥ 8, each of
    * weight 8 — so HALF the image differs between any two classes,
    * the aHash (block-aligned 4×4-pixel cells, global mean exactly
    * between the tones) reproduces the pattern bit-for-bit, and
    * inter-class hash distances are ≥ 32 (`classes` ≤ 30).
    * Solid blocks are DC-only and quality 75's Q(0,0)=8 makes the
    * JPEG round-trip EXACT (qDC = v−128 lands on an integer), so
    * decoded pixels — and hence perceptual hashes — are byte-identical
    * across containers. The corpus a cross-format image-dedup pass
    * must collapse. */
  def synthMixedFormat(df: DataFrame, idCol: String, classes: Int): DataFrame = {
    require(classes <= 30, "RM(1,4) has 30 non-constant distance-8 patterns")
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val cls = (id % classes).toInt
          val hi = (200: Int).toByte
          val lo = (50: Int).toByte
          val px = new Array[Byte](32 * 32)
          var b = 0
          while (b < 16) {
            // non-constant RM(1,4) codeword: a0 XOR <mask, bits(b)>,
            // mask in 1..15 so the constant codewords are excluded
            val mask = 1 + (cls % 15)
            val a0 = cls / 15
            val bit = (a0 ^ Integer.bitCount(mask & b)) & 1
            val v = if (bit == 1) hi else lo
            val (bx, by) = (b % 4, b / 4)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                px((by * 8 + y) * 32 + (bx * 8 + x)) = v
                x += 1
              }
              y += 1
            }
            b += 1
          }
          val img = ImageCodec.RawImage(32, 32, 1, px)
          if ((id / classes) % 2 == 0) {
            val bytes = ImageCodec.encodePng(img)
            MediaRecord(id, bytes, "image/png", bytes.length.toLong)
          } else {
            val bytes = JpegCodec.encodeJpeg(img, quality = 75)
            MediaRecord(id, bytes, "image/jpeg", bytes.length.toLong)
          }
        }
      }.toDF()
  }

  /** One REAL PNG per row with seed-classed noise content: every row
    * whose id maps to the same `seed` (id mod `classes`) gets a
    * byte-identical image; distinct seeds get independent splitmix64
    * noise (so their perceptual hashes are far apart with overwhelming
    * probability). Alternates RGB / RGBA by seed parity to exercise
    * both color decode paths. The shape of an image-dedup corpus. */
  def synthNoisePng(df: DataFrame, idCol: String, classes: Int,
      width: Int = 32, height: Int = 24,
      perturbBrightness: Boolean = false): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val seed = id % classes
          val ch = if (seed % 2 == 0) 3 else 4
          // perturb mode: base channels masked to 0..247, then copies
          // of the same class alternate a +4 global brightness shift —
          // BYTES differ across copies (exact dedup misses them) while
          // area-average dHash/aHash are provably shift-invariant
          val shift = if (perturbBrightness) ((id / classes) % 2 * 4).toInt else 0
          val mask = if (perturbBrightness) 0xf7 else 0xff
          val px = new Array[Byte](width * height * ch)
          var p = 0
          while (p < width * height) {
            val r = mix64((seed << 32) | p.toLong)
            px(p * ch) = (((r & mask) + shift) & 0xff).toByte
            px(p * ch + 1) = ((((r >>> 8) & mask) + shift) & 0xff).toByte
            px(p * ch + 2) = ((((r >>> 16) & mask) + shift) & 0xff).toByte
            if (ch == 4) px(p * ch + 3) = ((r >>> 24) & 0xff).toByte
            p += 1
          }
          val png = ImageCodec.encodePng(ImageCodec.RawImage(width, height, ch, px))
          MediaRecord(id, png, "image/png", png.length.toLong)
        }
      }.toDF()
  }

  final case class ImageStats(
      media_id: Long, width: Int, height: Int, n_px: Long,
      mean_g: Long, min_g: Int, max_g: Int)

  /** Decode the binary PNG payload and measure gray-pixel statistics —
    * integer arithmetic only, so the oracle's per-pixel SQL matches
    * exactly. Rows whose payload does not decode are dropped (None →
    * no fabricated stats). */
  def decodeImageStats(media: DataFrame): Dataset[ImageStats] = {
    implicit val enc: Encoder[ImageStats] = Encoders.product[ImageStats]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          ImageCodec.decodeImage(r.content).map { img =>
            val gray = ImageOps.toGray(img)
            var sum = 0L; var mn = 255; var mx = 0
            var i = 0
            while (i < gray.pixels.length) {
              val g = gray.pixels(i) & 0xff
              sum += g
              if (g < mn) mn = g
              if (g > mx) mx = g
              i += 1
            }
            val n = gray.pixels.length.toLong
            ImageStats(r.media_id, img.width, img.height, n, sum / n, mn, mx)
          }
        }
      }
  }

  final case class ImageHash(media_id: Long, ahash: Long, dhash: Long)

  /** Decode payloads → gray → perceptual hashes (aHash/dHash 64-bit). */
  def decodeImageHashes(media: DataFrame): Dataset[ImageHash] = {
    implicit val enc: Encoder[ImageHash] = Encoders.product[ImageHash]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          ImageCodec.decodeImage(r.content).map { img =>
            val gray = ImageOps.toGray(img)
            ImageHash(r.media_id, ImageOps.aHash64(gray), ImageOps.dHash64(gray))
          }
        }
      }
  }

  /** One REAL 16-bit mono PCM WAV per row: n = 1024+(id%4)·256 samples,
    * s(i) = ((id·31 + i·17) mod 2001) − 1000 — SQL-recomputable. */
  def synthPcmWav(df: DataFrame, idCol: String,
      sampleRate: Int = 16000): DataFrame = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    df.select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (1024 + (id % 4) * 256).toInt
          val data = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = ((id * 31 + i.toLong * 17) % 2001 - 1000).toInt
            data(2 * i) = (s & 0xff).toByte
            data(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val wav = AudioHeaders.buildWav(data, channels = 1,
            sampleRate = sampleRate)
          MediaRecord(id, wav, "audio/wav", wav.length.toLong)
        }
      }.toDF()
  }

  final case class AudioFrameStats(
      media_id: Long, n_frames: Int, sum_rms2: Long, max_rms2: Long,
      total_zc: Long)

  /** Frame-level DSP over samples decoded from the WAV binary
    * ([[AudioHeaders.pcm16Samples]]): per 256-sample frame, integer
    * mean-square energy (Σs²/256, truncating) and zero-crossing count
    * (sign change vs the previous sample within the frame, `s ≥ 0` as
    * the sign convention). Output per payload: frame count, summed and
    * max frame energy, total crossings — the silence/energy screen of
    * an audio curation pipeline, on real container bytes. */
  def audioFrameStats(media: DataFrame, frame: Int = 256): Dataset[AudioFrameStats] = {
    implicit val enc: Encoder[AudioFrameStats] = Encoders.product[AudioFrameStats]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AudioHeaders.pcm16Samples(r.content).map { s =>
            val nFrames = s.length / frame
            var sumRms2 = 0L; var maxRms2 = 0L; var zc = 0L
            var f = 0
            while (f < nFrames) {
              var e = 0L
              var i = f * frame
              val end = (f + 1) * frame
              while (i < end) {
                val v = s(i).toLong
                e += v * v
                if (i > f * frame && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
                i += 1
              }
              val rms2 = e / frame
              sumRms2 += rms2
              if (rms2 > maxRms2) maxRms2 = rms2
              f += 1
            }
            AudioFrameStats(r.media_id, nFrames, sumRms2, maxRms2, zc)
          }
        }
      }
  }

  final case class ThumbPixel(media_id: Long, ci: Int, g: Int)

  /** Thumbnail pipeline on real binaries: decode PNG → gray → exact
    * area-average resize to (outW × outH) → RE-ENCODE as PNG → decode
    * AGAIN → emit every thumbnail pixel. The double round-trip means a
    * defect in resize, the second encode, or the second decode all
    * surface as wrong pixel values; `ci` is the row-major cell index. */
  def thumbnailPixels(media: DataFrame, outW: Int, outH: Int): Dataset[ThumbPixel] = {
    implicit val enc: Encoder[ThumbPixel] = Encoders.product[ThumbPixel]
    media.select("media_id", "content", "mime_type", "n_bytes")
      .as(Encoders.product[MediaRecord])
      .mapPartitions { rows =>
        rows.flatMap { r =>
          ImageCodec.decodeImage(r.content).toSeq.flatMap { img =>
            val cells = ImageOps.resizeAreaAvg(ImageOps.toGray(img), outW, outH)
            val px = cells.map(_.toByte)
            val thumb = ImageCodec.encodePng(
              ImageCodec.RawImage(outW, outH, 1, px))
            ImageCodec.decodePng(thumb).toSeq.flatMap { t =>
              t.pixels.iterator.zipWithIndex.map { case (g, i) =>
                ThumbPixel(r.media_id, i, g & 0xff)
              }
            }
          }
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
