package graft.operators

import java.nio.ByteBuffer

/**
 * Pure-JVM ISO Base Media File Format (MP4) container support: a
 * canonical writer and a recursive box-walking metadata parser — no
 * codec libraries, no sample decode. The video analog of
 * [[ImageHeaders]]/[[AudioHeaders]]: duration/timescale/track metadata
 * from `moov` is how curation filters video WITHOUT paying for a
 * decode (the reference stores media as opaque bytes plus metadata;
 * `airbyte/` never decodes payloads).
 *
 * Layout (ISO/IEC 14496-12, all BIG-endian): a file is a sequence of
 * boxes `(u32 size, 4-char type, payload)`; `size == 1` switches to a
 * u64 largesize at offset 8 (16-byte header), `size == 0` means
 * to-end-of-file (last box only). Container boxes (`moov`, `trak`,
 * `mdia`, `minf`, `stbl`, `edts`, `udta`) nest child boxes directly.
 * Full boxes carry `(u8 version, u24 flags)` first in the payload;
 * `mvhd`/`mdhd` move their timescale/duration fields when version=1
 * widens the timestamps to u64.
 */
object Mp4Headers {

  final case class Mp4Meta(
      brand: String, timescale: Long, durationTicks: Long, durationMs: Long,
      nTracks: Int, handlers: Seq[String], mdatBytes: Long)

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts", "udta")

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal valid MP4: `ftyp` + `moov{mvhd, trak{tkhd, mdia{mdhd,
    * hdlr}}}` + `mdat` around the payload bytes. Version-0 full boxes;
    * one track whose handler type is caller-chosen (`vide`/`soun`).
    * `largeMdat` emits the mdat with a size-1 + u64 largesize header
    * (the form real muxers use past 4 GiB) so the parser's largesize
    * path is exercised by construction. */
  def buildMp4(data: Array[Byte], timescale: Int, durationTicks: Long,
      handler: String, largeMdat: Boolean = false): Array[Byte] = {
    // version-0 mvhd/tkhd/mdhd carry u32 durations; a larger value would
    // silently truncate to a structurally valid file with wrong metadata
    require(timescale > 0 && durationTicks >= 0 && durationTicks <= 0xFFFFFFFFL
        && handler.length == 4,
      s"invalid mp4 params: timescale=$timescale dur=$durationTicks handler=$handler" +
        " (version-0 boxes hold durations up to 2^32-1 ticks)")
    val name = "GraftHandler".getBytes("US-ASCII") :+ 0.toByte
    val hdlrSz = 8 + 4 + 4 + 4 + 12 + name.length
    val mdhdSz = 32
    val mdiaSz = 8 + mdhdSz + hdlrSz
    val tkhdSz = 92
    val trakSz = 8 + tkhdSz + mdiaSz
    val mvhdSz = 108
    val moovSz = 8 + mvhdSz + trakSz
    val mdatHeader = if (largeMdat) 16 else 8
    val out = ByteBuffer.allocate(24 + moovSz + mdatHeader + data.length)
    // ftyp
    out.putInt(24).put(fourcc("ftyp")).put(fourcc("isom"))
      .putInt(0x200).put(fourcc("isom")).put(fourcc("mp41"))
    // moov > mvhd (version 0)
    out.putInt(moovSz).put(fourcc("moov"))
    out.putInt(mvhdSz).put(fourcc("mvhd")).putInt(0) // version/flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
      .putLong(0) // reserved
    putUnityMatrix(out)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_ID
    // trak > tkhd (version 0, flags 7 = enabled|in_movie|in_preview)
    out.putInt(trakSz).put(fourcc("trak"))
    out.putInt(tkhdSz).put(fourcc("tkhd")).putInt(7)
      .putInt(0).putInt(0) // creation, modification
      .putInt(1).putInt(0) // track_ID, reserved
      .putInt(durationTicks.toInt).putLong(0) // duration, reserved
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, rsvd
    putUnityMatrix(out)
    out.putInt(0).putInt(0) // width, height (16.16 — non-visual track)
    // mdia > mdhd + hdlr
    out.putInt(mdiaSz).put(fourcc("mdia"))
    out.putInt(mdhdSz).put(fourcc("mdhd")).putInt(0)
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durationTicks.toInt)
      .putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
    out.putInt(hdlrSz).put(fourcc("hdlr")).putInt(0)
      .putInt(0).put(fourcc(handler)) // pre_defined, handler_type
      .putInt(0).putInt(0).putInt(0) // reserved
      .put(name)
    // mdat
    if (largeMdat) out.putInt(1).put(fourcc("mdat")).putLong(16L + data.length)
    else out.putInt(8 + data.length).put(fourcc("mdat"))
    out.put(data)
    out.array()
  }

  private def putUnityMatrix(out: ByteBuffer): Unit = {
    out.putInt(0x00010000).putInt(0).putInt(0)
    out.putInt(0).putInt(0x00010000).putInt(0)
    out.putInt(0).putInt(0).putInt(0x40000000)
  }

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private def tag(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length) new String(b, off, 4, "US-ASCII") else ""

  /** Accumulator for one recursive walk. */
  private final class Acc {
    var brand: String = null
    var timescale: Long = -1
    var duration: Long = -1
    var nTracks = 0
    val handlers = Seq.newBuilder[String]
    var mdatBytes = 0L
  }

  /**
   * Parse container metadata from the byte stream: recursive box walk
   * (bounded depth), `ftyp` brand, version-0/1 `mvhd`
   * timescale/duration, `trak` count, `hdlr` handler types in file
   * order, total `mdat` payload bytes (u32, largesize, and
   * to-end-of-file forms). Returns None for anything that is not a
   * well-formed BMFF stream with an `mvhd` — never throws, never
   * fabricates: a size field overrunning the buffer ends that level's
   * walk (truncated file — metadata already seen still counts, the
   * header-only object-store scan behavior).
   */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 16 || tag(bytes, 4) != "ftyp") return None
    val acc = new Acc
    walk(bytes, 0, bytes.length, 0, acc)
    if (acc.timescale <= 0 || acc.duration < 0) None
    else Some(Mp4Meta(acc.brand, acc.timescale, acc.duration,
      acc.duration * 1000L / acc.timescale, acc.nTracks,
      acc.handlers.result(), acc.mdatBytes))
  }

  private def walk(b: Array[Byte], start: Int, end: Int, depth: Int, acc: Acc): Unit = {
    if (depth > 8) return // malformed self-nesting guard
    var pos = start
    while (pos + 8 <= end) {
      val rawSize = u32(b, pos)
      val boxType = tag(b, pos + 4)
      // header size + total box size under the three size encodings
      val (hdr, size) =
        if (rawSize == 1) {
          if (pos + 16 > end) return
          (16, u64(b, pos + 8))
        } else if (rawSize == 0) (8, (end - pos).toLong)
        else (8, rawSize)
      if (size < hdr || size > end.toLong - pos) return // truncated/corrupt
      val payload = pos + hdr
      val payloadEnd = pos + size.toInt
      boxType match {
        case "ftyp" =>
          if (acc.brand == null && payload + 4 <= payloadEnd)
            acc.brand = tag(b, payload)
        case "mvhd" =>
          if (payload + 4 <= payloadEnd) {
            val version = b(payload) & 0xff
            if (version == 1 && payload + 32 <= payloadEnd) {
              acc.timescale = u32(b, payload + 20)
              acc.duration = u64(b, payload + 24)
            } else if (version == 0 && payload + 20 <= payloadEnd) {
              acc.timescale = u32(b, payload + 12)
              acc.duration = u32(b, payload + 16)
            }
          }
        case "hdlr" =>
          if (payload + 12 <= payloadEnd)
            acc.handlers += tag(b, payload + 8)
        case "mdat" =>
          acc.mdatBytes += size - hdr
        case "trak" =>
          acc.nTracks += 1
          walk(b, payload, payloadEnd, depth + 1, acc)
        case t if Containers(t) =>
          walk(b, payload, payloadEnd, depth + 1, acc)
        case _ => // unknown box: skip
      }
      pos = payloadEnd
    }
  }
}
