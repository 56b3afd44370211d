package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal ZIP (PKWARE APPNOTE) codec over STORED entries — the archive
 * container office/code corpora arrive in, and the complement of the
 * tar shard manifest (q171): entry names, sizes, and CRC-32 integrity
 * come from the central directory without decompressing anything.
 * Build side writes local file headers + central directory + end-of-
 * central-directory, all offsets byte-exact; parse side locates EOCD
 * from the end, walks the central directory, verifies each entry's
 * local-header signature sits at its recorded offset, and re-computes
 * CRC-32 over the stored payload against the recorded value — the
 * corruption check an ingest pipeline runs per shard. Malformed input
 * yields None, never an exception and never fabricated metadata.
 *
 * Scale shape: like every codec here, build→parse runs as per-row
 * kernels inside the scan partitions; only the tally's grouped rows
 * ever cross an exchange.
 */
object ZipHeaders {

  final case class ZipEntry(name: String, size: Long, crcOk: Boolean)

  final case class ZipMeta(
      nEntries: Int,
      totalBytes: Long, // sum of uncompressed sizes
      crcMismatches: Int,
      offsetsValid: Boolean, // every CD offset hits a local header
      names: Seq[String])

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50

  private def crc32(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue.toInt
  }

  /** Build a STORED-method ZIP of the named payloads. */
  def buildZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty && entries.forall { case (n, d) =>
      n.nonEmpty && n.length <= 255 && d != null
    }, "zip entries need non-empty names and payloads")
    val localLen = entries.map { case (n, d) => 30 + n.length + d.length }.sum
    val cdLen = entries.map { case (n, _) => 46 + n.length }.sum
    val out = ByteBuffer.allocate(localLen + cdLen + 22)
      .order(ByteOrder.LITTLE_ENDIAN)
    val offsets = new Array[Int](entries.length)
    entries.zipWithIndex.foreach { case ((name, data), i) =>
      offsets(i) = out.position()
      val nb = name.getBytes("UTF-8")
      out.putInt(LocalSig).putShort(20).putShort(0).putShort(0) // ver, flags, method=stored
        .putShort(0).putShort(0) // time, date
        .putInt(crc32(data)).putInt(data.length).putInt(data.length)
        .putShort(nb.length.toShort).putShort(0) // name len, extra len
        .put(nb).put(data)
    }
    val cdOff = out.position()
    entries.zipWithIndex.foreach { case ((name, data), i) =>
      val nb = name.getBytes("UTF-8")
      out.putInt(CentralSig).putShort(20).putShort(20).putShort(0).putShort(0)
        .putShort(0).putShort(0) // time, date
        .putInt(crc32(data)).putInt(data.length).putInt(data.length)
        .putShort(nb.length.toShort).putShort(0).putShort(0) // name, extra, comment
        .putShort(0).putShort(0).putInt(0) // disk, int attrs, ext attrs
        .putInt(offsets(i))
        .put(nb)
    }
    val cdEnd = out.position() // capture BEFORE the EOCD record starts
    out.putInt(EocdSig).putShort(0).putShort(0)
      .putShort(entries.length.toShort).putShort(entries.length.toShort)
      .putInt(cdEnd - cdOff).putInt(cdOff).putShort(0)
    out.array()
  }

  /** Parse ZIP metadata with CRC verification; None for anything that
    * is not a well-formed single-disk archive. */
  def parse(bytes: Array[Byte]): Option[ZipMeta] = {
    if (bytes == null || bytes.length < 22) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // EOCD: scan back past a possible trailing comment
    var eocd = bytes.length - 22
    while (eocd >= 0 && buf.getInt(eocd) != EocdSig) eocd -= 1
    if (eocd < 0) return None
    val n = buf.getShort(eocd + 10) & 0xFFFF
    val cdOff = buf.getInt(eocd + 16)
    if (n == 0 || cdOff < 0 || cdOff >= bytes.length) return None
    var off = cdOff
    var total = 0L
    var mismatches = 0
    var offsetsValid = true
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < n) {
      if (off + 46 > bytes.length || buf.getInt(off) != CentralSig) return None
      val crc = buf.getInt(off + 16)
      val size = buf.getInt(off + 24).toLong & 0xFFFFFFFFL
      val nameLen = buf.getShort(off + 28) & 0xFFFF
      val extraLen = buf.getShort(off + 30) & 0xFFFF
      val commentLen = buf.getShort(off + 32) & 0xFFFF
      val lhOff = buf.getInt(off + 42)
      if (off + 46 + nameLen > bytes.length) return None
      val name = new String(bytes, off + 46, nameLen, "UTF-8")
      names += name
      if (lhOff < 0 || lhOff + 30 + nameLen + size > bytes.length ||
        buf.getInt(lhOff) != LocalSig) {
        offsetsValid = false
      } else {
        val dataOff = lhOff + 30 + (buf.getShort(lhOff + 26) & 0xFFFF) +
          (buf.getShort(lhOff + 28) & 0xFFFF)
        if (dataOff + size > bytes.length) return None
        val data = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size.toInt)
        if (crc32(data) != crc) mismatches += 1
        total += size
      }
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(ZipMeta(n, total, mismatches, offsetsValid, names.result()))
  }
}
