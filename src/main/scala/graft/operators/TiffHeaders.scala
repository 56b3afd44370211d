package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal TIFF 6.0 baseline metadata codec — the container EXIF rides
 * on. Build side writes a structurally valid single-IFD file (either
 * byte order, sorted tags, SHORT/LONG inline values, RATIONAL by
 * offset); parse side walks the real IFD from the header offset,
 * honoring the declared byte order, bounds-checked everywhere —
 * malformed input yields None, never an exception and never fabricated
 * metadata. Public TIFF 6.0 / EXIF 2.3 layout; completes the
 * per-format family in [[ImageHeaders]] (PNG/GIF/JPEG/BMP) and
 * [[Mp4Headers]].
 *
 * Scale shape: like every codec here, build→parse runs as per-row
 * kernels inside the scan partitions; only the tally's grouped rows
 * ever cross an exchange.
 */
object TiffHeaders {

  final case class TiffMeta(
      byteOrder: String, // "II" little-endian | "MM" big-endian
      width: Long,
      height: Long,
      orientation: Int, // 1..8 (EXIF orientation values)
      bitsPerSample: Int,
      xResNum: Long,
      xResDen: Long,
      nEntries: Int)

  // TIFF tag ids (TIFF 6.0 §8)
  private val TagWidth = 256
  private val TagHeight = 257
  private val TagBits = 258
  private val TagOrientation = 274
  private val TagXRes = 282
  private val TagResUnit = 296

  /** Build a minimal valid TIFF: header + one IFD with 6 ascending
    * tags (width, height, bits, orientation, x-resolution, unit) +
    * the RATIONAL payload. */
  def buildTiff(width: Int, height: Int, orientation: Int, xres: Int,
      littleEndian: Boolean): Array[Byte] = {
    require(width > 0 && height > 0 && orientation >= 1 && orientation <= 8
        && xres > 0,
      s"invalid tiff params: w=$width h=$height o=$orientation xres=$xres")
    val nEntries = 6
    val ratOff = 8 + 2 + nEntries * 12 + 4 // header + count + entries + next-IFD
    val out = ByteBuffer.allocate(ratOff + 8)
    out.order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    out.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    out.putShort(42)
    out.putInt(8) // first-IFD offset
    out.putShort(nEntries.toShort)
    // SHORT (type 3) inline values sit in the FIRST TWO BYTES of the
    // 4-byte value field in file byte order (TIFF 6.0 §2 value layout)
    def shortEntry(tag: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(3).putInt(1)
      out.putShort(v.toShort).putShort(0)
    }
    def longEntry(tag: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(4).putInt(1).putInt(v)
    }
    longEntry(TagWidth, width)
    longEntry(TagHeight, height)
    shortEntry(TagBits, 8)
    shortEntry(TagOrientation, orientation)
    out.putShort(TagXRes.toShort).putShort(5).putInt(1).putInt(ratOff)
    shortEntry(TagResUnit, 2) // inches
    out.putInt(0) // no next IFD
    out.putInt(xres).putInt(1) // RATIONAL xres/1
    out.array()
  }

  /** Parse TIFF metadata; None for anything that is not a well-formed
    * single-IFD baseline file (honest failure, no fabrication). */
  def parse(bytes: Array[Byte]): Option[TiffMeta] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val buf = ByteBuffer.wrap(bytes)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    def u16(off: Int): Int =
      if (off < 0 || off + 2 > bytes.length) -1 else buf.getShort(off) & 0xFFFF
    def u32(off: Int): Long =
      if (off < 0 || off + 4 > bytes.length) -1L else buf.getInt(off) & 0xFFFFFFFFL
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd > Int.MaxValue) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + n * 12L + 4 > bytes.length) return None
    var (width, height) = (-1L, -1L)
    var orientation = 1 // EXIF default when the tag is absent
    var bits = 1 // TIFF default BitsPerSample
    var (xn, xd) = (0L, 1L)
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      // inline value: SHORT reads the first 2 bytes, LONG all 4
      def inlineVal: Long = typ match {
        case 3 => u16(e + 8).toLong
        case 4 => u32(e + 8)
        case _ => -1L
      }
      if (count == 1) tag match {
        case TagWidth => width = inlineVal
        case TagHeight => height = inlineVal
        case TagBits => if (typ == 3) bits = u16(e + 8)
        case TagOrientation =>
          if (typ == 3) {
            val o = u16(e + 8)
            if (o >= 1 && o <= 8) orientation = o else return None
          }
        case TagXRes =>
          if (typ == 5) {
            val off = u32(e + 8)
            if (off < 0 || off + 8 > bytes.length) return None
            xn = u32(off.toInt)
            xd = u32(off.toInt + 4)
          }
        case _ => () // unknown tags are legal; skip
      }
      i += 1
    }
    if (width <= 0 || height <= 0) return None
    Some(TiffMeta(if (le) "II" else "MM", width, height, orientation,
      bits, xn, xd, n))
  }
}
