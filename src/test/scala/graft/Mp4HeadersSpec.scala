package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp4Headers

/**
 * Pure-JVM ISO-BMFF (MP4) container contract — the real parse path
 * behind q187. Beyond the DuckDB oracle gate, this spec pins what the
 * oracle cannot see: exact metadata round-trips through the recursive
 * box walk, the three size encodings (u32, largesize, to-end-of-file),
 * version-1 mvhd timestamp widening, honest rejection of malformed
 * payloads, and a never-throws fuzz sweep.
 */
class Mp4HeadersSpec extends AnyFunSuite {

  private def payload(n: Int, seed: Int = 7): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 131) % 251).toByte)

  test("build→parse round-trips brand, timescale, duration, track, handler, mdat") {
    for {
      (n, ts, dur, h) <- Seq(
        (0, 600, 0L, "vide"), (1, 1000, 25L, "soun"),
        (257, 12288, 90000L, "vide"), (4096, 44100, 123456L, "soun"))
    } {
      val bytes = Mp4Headers.buildMp4(payload(n), ts, dur, h)
      val m = Mp4Headers.parse(bytes).getOrElse(fail(s"parse failed n=$n"))
      assert(m.brand == "isom" && m.timescale == ts && m.durationTicks == dur)
      assert(m.durationMs == dur * 1000L / ts)
      assert(m.nTracks == 1 && m.handlers == Seq(h) && m.mdatBytes == n.toLong)
    }
  }

  test("build rejects durations past u32 — version-0 boxes can't hold them") {
    // boundary passes; one past it must fail, not truncate to wrong metadata
    val edge = Mp4Headers.buildMp4(payload(8), 600, 0xFFFFFFFFL, "vide")
    assert(Mp4Headers.parse(edge).get.durationTicks == 0xFFFFFFFFL)
    val e = intercept[IllegalArgumentException](
      Mp4Headers.buildMp4(payload(8), 600, 0x100000000L, "vide"))
    assert(e.getMessage.contains("2^32-1"))
  }

  test("largesize mdat (size=1 + u64) parses identically to the u32 form") {
    val small = Mp4Headers.buildMp4(payload(300), 1000, 500L, "vide")
    val large = Mp4Headers.buildMp4(payload(300), 1000, 500L, "vide", largeMdat = true)
    assert(large.length == small.length + 8) // largesize header is 8 bytes wider
    val (ms, ml) = (Mp4Headers.parse(small).get, Mp4Headers.parse(large).get)
    assert(ms == ml)
  }

  test("version-1 mvhd (64-bit timestamps) parses timescale and duration") {
    // hand-build ftyp + moov{mvhd v1}: creation/modification widen to
    // u64, timescale at payload+20, duration u64 at payload+24
    val mvhdSz = 8 + 4 + 8 + 8 + 4 + 8 + 4 + 2 + 2 + 8 + 36 + 24 + 4
    val out = java.nio.ByteBuffer.allocate(24 + 8 + mvhdSz)
    out.putInt(24).put("ftyp".getBytes("US-ASCII"))
      .put("iso6".getBytes("US-ASCII")).putInt(0)
      .put("isom".getBytes("US-ASCII")).put("mp42".getBytes("US-ASCII"))
    out.putInt(8 + mvhdSz).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdSz).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1
      .putLong(0L).putLong(0L) // creation, modification (u64)
      .putInt(90000) // timescale
      .putLong(0x100000000L + 45000L) // duration > u32 range
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putLong(0L)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.putInt)
    (0 until 6).foreach(_ => out.putInt(0))
    out.putInt(2)
    val m = Mp4Headers.parse(out.array()).getOrElse(fail("v1 parse failed"))
    assert(m.brand == "iso6" && m.timescale == 90000L)
    assert(m.durationTicks == 0x100000000L + 45000L)
    assert(m.nTracks == 0 && m.handlers.isEmpty)
  }

  test("rejects malformed payloads honestly, never fabricates") {
    assert(Mp4Headers.parse(null).isEmpty)
    assert(Mp4Headers.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4Headers.parse(payload(64)).isEmpty) // no ftyp
    assert(Mp4Headers.parse("RIFF....WAVE".getBytes("US-ASCII")).isEmpty)
    // an ftyp with no moov/mvhd has no timescale — None, not zeros
    val ftypOnly = java.nio.ByteBuffer.allocate(24)
      .putInt(24).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
      .putInt(0).put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
    assert(Mp4Headers.parse(ftypOnly.array()).isEmpty)
  }

  test("fuzz: truncations and bit-flips of a valid file never throw") {
    val good = Mp4Headers.buildMp4(payload(512), 12288, 7777L, "vide")
    for (cut <- 0 to good.length by 13)
      Mp4Headers.parse(good.take(cut)) // must not throw
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val b = good.clone()
      for (_ <- 1 to 4)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4Headers.parse(b) // must not throw
    }
    // random garbage, including strings that fake box types
    for (i <- 1 to 100) {
      val g = Array.tabulate(64 + i)(j => ((i * 37 + j * 101) % 256).toByte)
      Mp4Headers.parse(g)
    }
  }

  test("a size-zero (to-end-of-file) trailing mdat is counted") {
    val base = Mp4Headers.buildMp4(payload(100), 600, 42L, "soun")
    // rewrite the trailing mdat header to size=0 (extends to EOF)
    val mdatOff = base.length - 8 - 100
    val bb = java.nio.ByteBuffer.wrap(base)
    bb.putInt(mdatOff, 0)
    val m = Mp4Headers.parse(base).getOrElse(fail("size-0 parse failed"))
    assert(m.mdatBytes == 100L)
  }
}
