package graft.operators

/**
 * Pure-JVM ustar (POSIX tar) writer + reader — the container behind
 * WebDataset-style training-shard export, where a corpus is packed
 * into size-budgeted archive shards consumed sequentially by data
 * loaders. The format is the published POSIX.1-1988/ustar layout:
 * 512-byte headers (name, octal size/mode/mtime, checksum over the
 * header with the checksum field blanked, "ustar" magic), payload
 * rounded up to 512-byte blocks, two zero blocks as end-of-archive.
 * Everything deterministic (mtime 0, fixed mode/uid/gid) so identical
 * input produces byte-identical shards, and the size arithmetic
 * (512 + ⌈size/512⌉·512 per entry + 1024 trailer) is exactly
 * reproducible by the manifest oracle.
 *
 * (Reference scope note: PyAirbyte exports caches to files/datasets —
 * `airbyte/caches/base.py`, `airbyte/datasets/` — but has no shard
 * container; this is part of the training-data surface this engine
 * adds. No blocking-factor padding beyond the two trailer blocks: GNU
 * tar reads such archives fine, and the fixed trailer keeps shard
 * size a pure function of the entry sizes.)
 */
object TarArchive {

  final case class Entry(name: String, data: Array[Byte])

  private val BlockSize = 512

  /** Serialize entries into one deterministic ustar archive. */
  def write(entries: Seq[Entry]): Array[Byte] = {
    val payload = entries.map(e => BlockSize + pad(e.data.length)).sum
    val out = new Array[Byte](payload + 2 * BlockSize) // zero-filled
    var off = 0
    entries.foreach { e =>
      writeHeader(out, off, e.name, e.data.length)
      off += BlockSize
      System.arraycopy(e.data, 0, out, off, e.data.length)
      off += pad(e.data.length)
    }
    out
  }

  /** Parse an archive back to its entries; None on malformed or
    * out-of-contract input (bad magic, bad checksum, truncated
    * payload, non-regular-file typeflag, prefix-split long name) —
    * never partial. The reader's contract is the WRITER's dialect:
    * foreign archives using directory/link entries or the ustar
    * prefix field are rejected rather than silently misread as data
    * entries with wrong names (round-4 advisor finding). */
  def read(bytes: Array[Byte]): Option[Seq[Entry]] = {
    if (bytes == null || bytes.length % BlockSize != 0) return None
    val entries = Seq.newBuilder[Entry]
    var off = 0
    while (off + BlockSize <= bytes.length) {
      if (isZeroBlock(bytes, off)) return Some(entries.result()) // end marker
      val magic = new String(bytes, off + 257, 5, "US-ASCII")
      if (magic != "ustar") return None
      val stored = octal(bytes, off + 148, 8).getOrElse(return None)
      if (checksum(bytes, off) != stored) return None
      // typeflag: only regular files ('0' or NUL) are in-contract
      val typeflag = bytes(off + 156)
      if (typeflag != '0' && typeflag != 0) return None
      // a non-empty ustar prefix field means the real name is
      // prefix/name — the writer never splits, so reject
      if (bytes(off + 345) != 0) return None
      val nameEnd = {
        var i = off; while (i < off + 100 && bytes(i) != 0) i += 1; i
      }
      val name = new String(bytes, off, nameEnd - off, "UTF-8")
      val size = octal(bytes, off + 124, 12).getOrElse(return None)
      if (size < 0 || off + BlockSize + size > bytes.length) return None
      val data = java.util.Arrays.copyOfRange(
        bytes, off + BlockSize, off + BlockSize + size.toInt)
      entries += Entry(name, data)
      off += BlockSize + pad(size.toInt)
    }
    None // ran off the end without the zero-block trailer
  }

  private def pad(n: Int): Int = ((n + BlockSize - 1) / BlockSize) * BlockSize

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + BlockSize) { if (b(i) != 0) return false; i += 1 }
    true
  }

  private def writeHeader(out: Array[Byte], off: Int, name: String,
      size: Int): Unit = {
    val nb = name.getBytes("UTF-8")
    require(nb.length <= 100, s"entry name too long: $name")
    System.arraycopy(nb, 0, out, off, nb.length)
    putOctal(out, off + 100, 8, 420)      // mode 0644
    putOctal(out, off + 108, 8, 0)        // uid
    putOctal(out, off + 116, 8, 0)        // gid
    putOctal(out, off + 124, 12, size)
    putOctal(out, off + 136, 12, 0)       // mtime 0 → deterministic bytes
    out(off + 156) = '0'                  // regular file
    "ustar".getBytes("US-ASCII").copyToArray(out, off + 257)
    out(off + 263) = '0'; out(off + 264) = '0' // version "00"
    // checksum: computed with the checksum field read as spaces
    java.util.Arrays.fill(out, off + 148, off + 156, ' '.toByte)
    val ck = checksum(out, off)
    val s = ("%06o".format(ck)).getBytes("US-ASCII")
    System.arraycopy(s, 0, out, off + 148, 6)
    out(off + 154) = 0
    out(off + 155) = ' '
  }

  private def putOctal(out: Array[Byte], off: Int, width: Int,
      value: Long): Unit = {
    val s = java.lang.Long.toOctalString(value)
    val padded = ("0" * (width - 1 - s.length)) + s
    System.arraycopy(padded.getBytes("US-ASCII"), 0, out, off, width - 1)
    out(off + width - 1) = 0
  }

  private def octal(b: Array[Byte], off: Int, width: Int): Option[Long] = {
    var v = 0L; var seen = false
    var i = off
    while (i < off + width) {
      val c = b(i)
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c != 0 && c != ' ') return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  /** Header checksum: unsigned byte sum with bytes 148-155 as spaces. */
  private def checksum(b: Array[Byte], off: Int): Long = {
    var sum = 0L
    var i = 0
    while (i < BlockSize) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xff)
      i += 1
    }
    sum
  }
}
