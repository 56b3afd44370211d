package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal WebP (RIFF) container metadata codec — the third web image
 * container next to PNG/GIF/JPEG in [[ImageHeaders]], and the one
 * whose dimensions hide in three DIFFERENT places depending on the
 * variant: the lossy `VP8 ` frame tag, the lossless `VP8L` signature
 * word, or the extended `VP8X` canvas fields. A curation pipeline that
 * only handles one variant silently drops or mis-sizes the others, so
 * the parser covers all three plus the `ANIM`/`ANMF` animation chunks
 * (frame count and loop count are the fields an image dedup keys on to
 * keep stills and animations apart).
 *
 * Layout (public RIFF + WebP container spec): `"RIFF" u32le(size)
 * "WEBP"` then a chunk sequence `fourcc u32le(size) payload [pad]`
 * where odd-sized payloads carry one pad byte. `VP8 ` holds a 3-byte
 * frame tag, the 0x9D012A start code, then 14-bit width/height in two
 * u16le words. `VP8L` holds the 0x2F signature then width-1/height-1
 * as 14-bit fields of a packed u32le. `VP8X` holds a feature-flag
 * byte, 24 reserved bits, then canvas width-1/height-1 as u24le.
 * Build side writes all three variants; parse side walks the real
 * chunk list, bounds-checked — malformed input yields None, never an
 * exception and never fabricated metadata.
 *
 * Scale shape: like every codec here, build→parse runs as per-row
 * kernels inside the scan partitions; only the tally's grouped rows
 * ever cross an exchange.
 */
object WebpHeaders {

  final case class WebpMeta(
      format: String, // "lossy" | "lossless" | "extended"
      width: Long,
      height: Long,
      hasAlpha: Boolean,
      nFrames: Int, // ANMF count for animations; 1 for stills
      loopCount: Int, // ANIM loop field; 0 for stills
      riffBytes: Long) // declared RIFF payload size

  // VP8X feature-flag bits (WebP container spec, MSB-first byte:
  // Rsv Rsv ICC Alpha EXIF XMP Animation Rsv)
  private val FlagAlpha = 0x10
  private val FlagAnim = 0x02

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One RIFF chunk: fourcc + u32le size + payload + odd-size pad. */
  private def chunk(out: ByteBuffer, cc: String, payload: Array[Byte]): Unit = {
    out.put(fourcc(cc)).putInt(payload.length).put(payload)
    if (payload.length % 2 == 1) out.put(0.toByte)
  }

  private def chunkLen(payloadLen: Int): Int =
    8 + payloadLen + (payloadLen % 2)

  /** Deterministic filler standing in for the compressed image stream
    * past the parsed header fields. */
  private def filler(n: Int, seed: Long): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) { a(i) = ((seed * 31 + i * 17) & 0xFF).toByte; i += 1 }
    a
  }

  /** Simple lossy WebP: one `VP8 ` chunk whose frame tag + start code
    * + 14-bit dimension words are real. */
  def buildLossy(width: Int, height: Int, extraBytes: Int, seed: Long): Array[Byte] = {
    require(width > 0 && width < 0x4000 && height > 0 && height < 0x4000
        && extraBytes >= 0,
      s"invalid lossy webp params: w=$width h=$height extra=$extraBytes" +
        " (VP8 dimensions are 14-bit fields)")
    val payload = ByteBuffer.allocate(10 + extraBytes).order(ByteOrder.LITTLE_ENDIAN)
    // frame tag: key frame (bit 0 = 0), version 0, show_frame = 1,
    // first-partition size 0 — 3 bytes little-endian
    payload.put(0x10.toByte).put(0.toByte).put(0.toByte)
    payload.put(0x9D.toByte).put(0x01.toByte).put(0x2A.toByte) // start code
    payload.putShort((width & 0x3FFF).toShort) // 14-bit width, 2-bit scale 0
    payload.putShort((height & 0x3FFF).toShort)
    payload.put(filler(extraBytes, seed))
    wrap(Seq("VP8 " -> payload.array()))
  }

  /** Simple lossless WebP: one `VP8L` chunk with the 0x2F signature and
    * the packed 14-bit width-1/height-1 + alpha-hint word. */
  def buildLossless(width: Int, height: Int, hasAlpha: Boolean,
      extraBytes: Int, seed: Long): Array[Byte] = {
    require(width > 0 && width <= 0x4000 && height > 0 && height <= 0x4000
        && extraBytes >= 0,
      s"invalid lossless webp params: w=$width h=$height" +
        " (VP8L dimensions are 14-bit minus-one fields)")
    val packed = (width - 1) | ((height - 1) << 14) |
      (if (hasAlpha) 1 << 28 else 0) // version bits 29..31 stay 0
    val payload = ByteBuffer.allocate(5 + extraBytes).order(ByteOrder.LITTLE_ENDIAN)
    payload.put(0x2F.toByte).putInt(packed)
    payload.put(filler(extraBytes, seed))
    wrap(Seq("VP8L" -> payload.array()))
  }

  /** Extended animated WebP: `VP8X` (canvas + flags) + `ANIM` (loop
    * count) + `nFrames` × `ANMF` frames each embedding a real lossy
    * bitstream header for its subframe. */
  def buildAnimated(width: Int, height: Int, hasAlpha: Boolean,
      nFrames: Int, loopCount: Int, seed: Long): Array[Byte] = {
    require(width > 0 && width <= 0xFFFFFF && height > 0 && height <= 0xFFFFFF
        && nFrames >= 1 && loopCount >= 0 && loopCount <= 0xFFFF,
      s"invalid animated webp params: w=$width h=$height frames=$nFrames")
    def u24(out: ByteBuffer, v: Int): Unit =
      out.put((v & 0xFF).toByte).put(((v >> 8) & 0xFF).toByte)
        .put(((v >> 16) & 0xFF).toByte)
    val vp8x = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    vp8x.put(((if (hasAlpha) FlagAlpha else 0) | FlagAnim).toByte)
    u24(vp8x, 0) // reserved
    u24(vp8x, width - 1)
    u24(vp8x, height - 1)
    val anim = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
    anim.putInt(0xFFFFFFFF) // background color BGRA
    anim.putShort(loopCount.toShort)
    val subW = math.min(width, 0x3FFF)
    val subH = math.min(height, 0x3FFF)
    val frames = (0 until nFrames).map { i =>
      val sub = buildLossy(subW, subH, 4, seed + i)
      // ANMF payload: x/2, y/2, w-1, h-1 (u24le each), duration u24,
      // blend/dispose byte, then the frame's chunk list (the VP8 chunk
      // INSIDE the sub-file, i.e. skip its 12-byte RIFF header)
      val inner = java.util.Arrays.copyOfRange(sub, 12, sub.length)
      val anmf = ByteBuffer.allocate(16 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
      u24(anmf, 0); u24(anmf, 0)
      u24(anmf, subW - 1); u24(anmf, subH - 1)
      u24(anmf, 40 + i) // duration ms
      anmf.put(0.toByte)
      anmf.put(inner)
      "ANMF" -> anmf.array()
    }
    wrap(("VP8X" -> vp8x.array()) +: ("ANIM" -> anim.array()) +: frames)
  }

  private def wrap(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val riffLen = 4 + chunks.map(c => chunkLen(c._2.length)).sum
    val out = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(riffLen).put(fourcc("WEBP"))
    chunks.foreach { case (cc, p) => chunk(out, cc, p) }
    out.array()
  }

  /** Parse WebP metadata; None for anything that is not a well-formed
    * RIFF/WEBP file with a recognized first chunk (honest failure, no
    * fabrication). */
  def parse(bytes: Array[Byte]): Option[WebpMeta] = {
    if (bytes == null || bytes.length < 20) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WEBP") return None
    val riffBytes = buf.getInt(4) & 0xFFFFFFFFL
    def u24(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
        ((bytes(off + 2) & 0xFF) << 16)
    var off = 12
    var format: String = null
    var (w, h) = (-1L, -1L)
    var alpha = false
    var nFrames = 0
    var loop = 0
    while (off + 8 <= bytes.length) {
      val name = cc(off)
      val size = buf.getInt(off + 4) & 0xFFFFFFFFL
      val body = off + 8
      if (size < 0 || body + size > bytes.length) return None
      name match {
        case "VP8 " if format == null =>
          // frame tag (3) + start code (3) + two u16le dimension words
          if (size < 10) return None
          if ((bytes(body + 3) & 0xFF) != 0x9D ||
            (bytes(body + 4) & 0xFF) != 0x01 ||
            (bytes(body + 5) & 0xFF) != 0x2A) return None
          format = "lossy"
          w = (buf.getShort(body + 6) & 0x3FFF).toLong
          h = (buf.getShort(body + 8) & 0x3FFF).toLong
        case "VP8L" if format == null =>
          if (size < 5 || (bytes(body) & 0xFF) != 0x2F) return None
          format = "lossless"
          val packed = buf.getInt(body + 1)
          w = (packed & 0x3FFF).toLong + 1
          h = ((packed >> 14) & 0x3FFF).toLong + 1
          alpha = ((packed >> 28) & 1) == 1
        case "VP8X" if format == null =>
          if (size < 10) return None
          format = "extended"
          val flags = bytes(body) & 0xFF
          alpha = (flags & FlagAlpha) != 0
          w = u24(body + 4).toLong + 1
          h = u24(body + 7).toLong + 1
        case "ANIM" =>
          if (size < 6) return None
          loop = buf.getShort(body + 4) & 0xFFFF
        case "ANMF" =>
          nFrames += 1
        case _ => () // ICCP/EXIF/XMP/ALPH and unknown chunks are legal
      }
      off = body + size.toInt + (size % 2).toInt
    }
    if (format == null || w <= 0 || h <= 0) return None
    Some(WebpMeta(format, w, h, alpha,
      if (nFrames == 0) 1 else nFrames, loop, riffBytes))
  }
}
