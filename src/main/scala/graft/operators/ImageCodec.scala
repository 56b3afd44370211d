package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * Pure-JVM PNG codec: a REAL pixel decode path for the multimodal
 * operators, not a stub. PNG's container (RFC 2083 / the W3C PNG
 * spec) needs only zlib, which the JDK ships (`java.util.zip`), so a
 * full encode → compress → filter and inflate → defilter → pixels
 * round-trip is possible with zero codec libraries. This upgrades the
 * multimodal story from "header parse only" ([[ImageHeaders]]) to a
 * genuine decode: curation stages that need pixels (perceptual
 * hashing, resize, brightness stats) run on real binary payloads.
 *
 * Reference behavior modeled: PyAirbyte treats unknown payloads as
 * opaque bytes (`airbyte/records.py` type failover); the pixel stage
 * is the training-data extension this engine adds on top.
 *
 * Scope (documented, honest): 8-bit depth, color types 0 (gray),
 * 2 (RGB), 6 (RGBA), non-interlaced — the shapes a curation pipeline
 * writes itself. Palette/16-bit/Adam7 payloads return None (never a
 * fabricated image). All five scanline filters (None/Sub/Up/Average/
 * Paeth) are implemented on BOTH sides; the encoder deliberately
 * cycles filters per row (y mod 5) so every decode exercises every
 * defilter branch — correctness of the whole loop is oracle-gated by
 * the media queries (q166+), whose expected statistics are computed
 * independently by DuckDB from the synthesis formula.
 */
object ImageCodec {

  /** Row-major interleaved pixels; channels ∈ {1 (gray), 3 (RGB), 4 (RGBA)}. */
  final case class RawImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
  }

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Format-dispatching decode by magic bytes: PNG signature →
    * [[decodePng]], JPEG SOI (FFD8) → [[JpegCodec.decodeJpeg]]. The
    * media operators route through this so perceptual hashing,
    * brightness gates, and thumbnails run on whichever container a
    * corpus actually holds (real crawls are mostly JPEG). */
  def decodeImage(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes == null || bytes.length < 8) return None
    if (bytes.take(8).sameElements(Signature)) decodePng(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      JpegCodec.decodeJpeg(bytes)
    else None
  }

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0
    case 3 => 2
    case 4 => 6
    case c => throw new IllegalArgumentException(s"unsupported channels $c")
  }

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1)
    case 2 => Some(3)
    case 6 => Some(4)
    case _ => None // palette (3) and gray+alpha (4) out of scope
  }

  // ---------------------------------------------------------------- encode

  /** Encode to a spec-conformant PNG. Filter type cycles `y % 5` so a
    * decode of our own output covers every defilter branch. */
  def encodePng(img: RawImage): Array[Byte] = {
    val bpp = img.channels
    val stride = img.width * bpp
    // filtered scanlines: per row, 1 filter-type byte + stride bytes
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      val outOff = y * (1 + stride)
      raw(outOff) = ft.toByte
      val rowOff = y * stride
      val priorOff = (y - 1) * stride
      var i = 0
      while (i < stride) {
        val x = img.pixels(rowOff + i) & 0xff
        val left = if (i >= bpp) img.pixels(rowOff + i - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels(priorOff + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) img.pixels(priorOff + i - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => x - paeth(left, up, ul)
        }
        raw(outOff + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    val idat = deflate(raw)
    val ihdr = new Array[Byte](13)
    writeBe32(ihdr, 0, img.width)
    writeBe32(ihdr, 4, img.height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType(img.channels).toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive, no interlace
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Full pixel decode. None for anything outside the documented scope
    * or failing CRC/structure checks — never a fabricated image. */
  def decodePng(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes == null || bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
    var pos = 8
    var width = 0; var height = 0; var channels = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length && !sawIend) {
      val len = readBe32(bytes, pos)
      // long arithmetic: a crafted length near Int.MaxValue must fail
      // the bounds check, not overflow past it into CRC32.update
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue != (readBe32(bytes, pos + 8 + len).toLong & 0xffffffffL))
        return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = readBe32(bytes, pos + 8)
          height = readBe32(bytes, pos + 12)
          val depth = bytes(pos + 16) & 0xff
          val ct = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (depth != 8 || interlace != 0) return None
          channelsOf(ct) match {
            case Some(c) => channels = c
            case None => return None
          }
          if (width <= 0 || height <= 0 ||
              width.toLong * height * channels > 64L * 1024 * 1024) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (!sawIhdr || !sawIend) return None
    val stride = width * channels
    val raw = inflate(idat.toByteArray, height * (1 + stride)).getOrElse(return None)
    if (raw.length != height * (1 + stride)) return None
    val pixels = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      val inOff = y * (1 + stride) + 1
      val rowOff = y * stride
      val priorOff = (y - 1) * stride
      var i2 = 0
      while (i2 < stride) {
        val f = raw(inOff + i2) & 0xff
        val left = if (i2 >= channels) pixels(rowOff + i2 - channels) & 0xff else 0
        val up = if (y > 0) pixels(priorOff + i2) & 0xff else 0
        val ul = if (y > 0 && i2 >= channels) pixels(priorOff + i2 - channels) & 0xff else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        pixels(rowOff + i2) = recon.toByte
        i2 += 1
      }
      y += 1
    }
    Some(RawImage(width, height, channels, pixels))
  }

  /** Paeth predictor exactly as specified (PNG spec §9, Filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(expected max 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // all input is set up front, so zero progress while unfinished
        // means truncated input OR an FDICT preset-dictionary request
        // (PNG forbids those; we never supply one) — reject, don't spin
        if (n == 0 && !inf.finished()) return None
        out.write(buf, 0, n)
        if (out.size() > expected) return None // overlong stream
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val lenBuf = new Array[Byte](4)
    writeBe32(lenBuf, 0, data.length)
    out.write(lenBuf)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    val crcBuf = new Array[Byte](4)
    writeBe32(crcBuf, 0, crc.getValue.toInt)
    out.write(crcBuf)
  }

  private def writeBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
}

/**
 * Integer pixel kernels over decoded images: grayscale conversion,
 * area-average downsample, and the two standard perceptual hashes
 * (average hash and difference hash — Krawetz's published aHash/dHash
 * constructions). Everything is exact integer arithmetic so results
 * are bit-stable across JVMs and reproducible by an independent
 * integer implementation (the DuckDB oracle re-derives the same
 * numbers from the synthesis formula in the media queries).
 */
object ImageOps {
  import ImageCodec.RawImage

  /** ITU-R BT.601 integer luma: (299·R + 587·G + 114·B) / 1000,
    * truncating division. Gray images pass through; RGBA ignores
    * alpha (the curation convention for hashing). */
  def toGray(img: RawImage): RawImage = {
    if (img.channels == 1) return img
    val n = img.width * img.height
    val out = new Array[Byte](n)
    var p = 0
    while (p < n) {
      val o = p * img.channels
      val r = img.pixels(o) & 0xff
      val g = img.pixels(o + 1) & 0xff
      val b = img.pixels(o + 2) & 0xff
      out(p) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      p += 1
    }
    RawImage(img.width, img.height, 1, out)
  }

  /** Exact block-partition area average: output cell (i,j) covers
    * source x ∈ [⌊j·w/W⌋, ⌊(j+1)·w/W⌋), y ∈ [⌊i·h/H⌋, ⌊(i+1)·h/H⌋);
    * value = ⌊sum/count⌋. Deterministic for any size ratio (no
    * floating-point resampling kernel to drift across platforms). */
  def resizeAreaAvg(gray: RawImage, outW: Int, outH: Int): Array[Int] = {
    require(gray.channels == 1, "resizeAreaAvg expects a gray image")
    val out = new Array[Int](outW * outH)
    var i = 0
    while (i < outH) {
      val y0 = i * gray.height / outH
      val y1 = ((i + 1) * gray.height / outH) max (y0 + 1)
      var j = 0
      while (j < outW) {
        val x0 = j * gray.width / outW
        val x1 = ((j + 1) * gray.width / outW) max (x0 + 1)
        var sum = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          val rowOff = y * gray.width
          while (x < x1) { sum += gray.pixels(rowOff + x) & 0xff; cnt += 1; x += 1 }
          y += 1
        }
        out(i * outW + j) = (sum / cnt).toInt
        j += 1
      }
      i += 1
    }
    out
  }

  /** Average hash: 8×8 area-average, bit k set iff cell k > the
    * truncating mean of the 64 cells. Bit order row-major, bit 63 =
    * cell (0,0) so the hex rendering reads top-left first. */
  def aHash64(gray: RawImage): Long = {
    val cells = resizeAreaAvg(gray, 8, 8)
    var sum = 0L
    var k = 0
    while (k < 64) { sum += cells(k); k += 1 }
    val mean = sum / 64
    var bits = 0L
    k = 0
    while (k < 64) {
      if (cells(k) > mean) bits |= 1L << (63 - k)
      k += 1
    }
    bits
  }

  /** Difference hash: 9×8 area-average, bit (row, col) set iff
    * cell(row, col) < cell(row, col+1) (left-to-right gradient sign).
    * 8 rows × 8 comparisons = 64 bits, same bit order as aHash. */
  def dHash64(gray: RawImage): Long = {
    val cells = resizeAreaAvg(gray, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c) < cells(r * 9 + c + 1)) bits |= 1L << (63 - (r * 8 + c))
        c += 1
      }
      r += 1
    }
    bits
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
