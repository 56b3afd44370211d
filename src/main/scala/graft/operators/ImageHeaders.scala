package graft.operators

/**
 * Pure-JVM image header parsing: container format + pixel dimensions
 * from the leading bytes of a payload — no codec libraries, no pixel
 * decode. This is the real metadata-extraction stage of a multimodal
 * pipeline (the full-pixel decode remains deployment-specific — see
 * [[Multimodal]]); dimension-from-header is how training-data curation
 * filters images by size WITHOUT paying for a decode.
 *
 * Formats are parsed from their published container layouts:
 *  - PNG: 8-byte signature, IHDR chunk at fixed offset (width/height
 *    big-endian at bytes 16-23).
 *  - GIF87a/89a: logical screen descriptor (width/height little-endian
 *    at bytes 6-9).
 *  - JPEG/JFIF: marker scan to the first SOFn frame header (height,
 *    width big-endian at offsets 5-8 inside the segment).
 *  - BMP: BITMAPINFOHEADER (width/height little-endian int32 at bytes
 *    18-25; height may be negative for top-down rows).
 */
object ImageHeaders {

  final case class ImageMeta(format: String, width: Int, height: Int)

  def parse(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 10) return None
    parsePng(bytes).orElse(parseGif(bytes)).orElse(parseJpeg(bytes))
      .orElse(parseBmp(bytes))
  }

  private def u8(b: Byte): Int = b & 0xff

  private def be32(b: Array[Byte], off: Int): Long =
    (u8(b(off)).toLong << 24) | (u8(b(off + 1)) << 16) |
      (u8(b(off + 2)) << 8) | u8(b(off + 3))

  private def le16(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) |
      (u8(b(off + 3)) << 24)

  private def be16(b: Array[Byte], off: Int): Int =
    (u8(b(off)) << 8) | u8(b(off + 1))

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 24) return None
    if (!b.take(8).sameElements(PngSig)) return None
    // first chunk must be IHDR: length(4) type(4)="IHDR" data(13)
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageMeta("png", w.toInt, h.toInt))
  }

  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h))
  }

  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || u8(b(0)) != 0xff || u8(b(1)) != 0xd8) return None
    var pos = 2
    while (pos + 3 < b.length) {
      if (u8(b(pos)) != 0xff) return None // corrupt marker stream
      var marker = u8(b(pos + 1))
      while (marker == 0xff && pos + 2 < b.length) { pos += 1; marker = u8(b(pos + 1)) }
      marker match {
        case 0xd8 | 0x01 => pos += 2 // standalone
        case m if m >= 0xd0 && m <= 0xd7 => pos += 2 // RSTn
        case 0xd9 => return None // EOI before any SOF
        case m if isSof(m) =>
          if (pos + 8 >= b.length) return None
          val h = be16(b, pos + 5); val w = be16(b, pos + 7)
          return if (w <= 0 || h <= 0) None else Some(ImageMeta("jpeg", w, h))
        case _ =>
          if (pos + 3 >= b.length) return None
          val len = be16(b, pos + 2)
          if (len < 2) return None
          pos += 2 + len
      }
    }
    None
  }

  /** SOF0-15 minus the non-frame C4 (DHT), C8 (JPG), CC (DAC). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  private def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    if (w <= 0 || h == 0) None else Some(ImageMeta("bmp", w, h))
  }
}
