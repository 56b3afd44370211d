package graft.operators

/**
 * Pure-JVM WAV (RIFF) container support: a canonical PCM writer and a
 * chunk-walking header parser — no codec libraries, no sample decode.
 * The audio analog of [[ImageHeaders]]: duration/rate/channel metadata
 * from the container header is how curation filters audio WITHOUT
 * paying for a decode, and the writer is the canonical-form export
 * shape (reference's media handling is opaque-bytes-plus-metadata;
 * `airbyte/` stores records, never decodes payloads).
 *
 * Layout (RIFF spec, all little-endian):
 *   "RIFF" size "WAVE" then chunks of (4-byte id, le32 size, data,
 *   odd sizes padded to even). "fmt " data for PCM: wFormatTag(1),
 *   nChannels, nSamplesPerSec, nAvgBytesPerSec, nBlockAlign,
 *   wBitsPerSample. "data" size = payload bytes.
 */
object AudioHeaders {

  final case class AudioMeta(
      format: String, channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataBytes: Long, durationMs: Long)

  /** Canonical PCM WAV around raw sample bytes; data is zero-padded to
    * a whole block (channels × bits/8), so the container is always
    * word-aligned and the duration arithmetic exact. */
  def buildWav(data: Array[Byte], channels: Int, sampleRate: Int,
      bitsPerSample: Int = 16): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample % 8 == 0,
      s"invalid PCM params: ch=$channels rate=$sampleRate bits=$bitsPerSample")
    val align = channels * bitsPerSample / 8
    val padded = data.length + ((align - data.length % align) % align)
    val out = java.nio.ByteBuffer.allocate(44 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + padded)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * align)
      .putShort(align.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(padded)
      .put(data)
    out.array() // trailing pad bytes are already zero
  }

  private def u8(b: Byte): Int = b & 0xff
  private def le16(b: Array[Byte], off: Int): Int =
    u8(b(off)) | (u8(b(off + 1)) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16)).toLong |
      (u8(b(off + 3)).toLong << 24)

  /** Parse PCM WAV metadata from the leading bytes. Walks the chunk
    * list (so files with LIST/INFO chunks before fmt/data still parse);
    * returns None for anything that is not a well-formed PCM WAV —
    * never throws, never fabricates. */
  def parse(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(off: Int): String =
      if (off + 4 <= bytes.length) new String(bytes, off, 4, "US-ASCII") else ""
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var channels = -1
    var sampleRate = -1L
    var byteRate = -1L
    var bits = -1
    var dataBytes = -1L
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val sz = le32(bytes, pos + 4)
      if (id == "fmt ") {
        if (sz < 16 || pos + 8 + 16 > bytes.length) return None
        if (le16(bytes, pos + 8) != 1) return None // PCM only
        channels = le16(bytes, pos + 10)
        sampleRate = le32(bytes, pos + 12)
        byteRate = le32(bytes, pos + 16)
        bits = le16(bytes, pos + 22)
      } else if (id == "data" && dataBytes < 0) {
        dataBytes = sz
      }
      // advance past the word-aligned chunk; a size that overruns the
      // buffer ends the walk (truncated file — metadata already seen
      // still counts, matching how header-only scans read object stores)
      if (sz > bytes.length.toLong - pos - 8) pos = bytes.length
      else pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || bits <= 0 ||
      dataBytes < 0) None
    else Some(AudioMeta("wav", channels, sampleRate.toInt, bits, dataBytes,
      dataBytes * 1000L / byteRate))
  }

  /** REAL sample decode for 16-bit PCM: locate the data chunk by the
    * same walk as [[parse]] and read little-endian int16 samples
    * (interleaved if multi-channel — callers frame per channel). None
    * unless the container is well-formed 16-bit PCM with a data chunk
    * fully inside the buffer. This is the audio analog of
    * [[ImageCodec.decodePng]]: the DSP queries (q168+) run on samples
    * recovered from the binary container, not on a side channel. */
  def pcm16Samples(bytes: Array[Byte]): Option[Array[Short]] = {
    val meta = parse(bytes).getOrElse(return None)
    if (meta.bitsPerSample != 16) return None
    def tag(off: Int): String =
      if (off + 4 <= bytes.length) new String(bytes, off, 4, "US-ASCII") else ""
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val sz = le32(bytes, pos + 4)
      if (id == "data") {
        if (sz > bytes.length.toLong - pos - 8 || sz % 2 != 0) return None
        val n = (sz / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = le16(bytes, pos + 8 + 2 * i).toShort
          i += 1
        }
        return Some(out)
      }
      if (sz > bytes.length.toLong - pos - 8) pos = bytes.length
      else pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }
}
