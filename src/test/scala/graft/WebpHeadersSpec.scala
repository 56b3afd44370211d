package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WebpHeaders

/**
 * Pure-JVM WebP (RIFF) container contract — the real parse path behind
 * q204. Beyond the DuckDB oracle gate, this spec pins what the oracle
 * cannot see: exact metadata round-trips through all THREE dimension
 * encodings (VP8 frame tag, VP8L packed word, VP8X canvas fields),
 * animation chunk walking, odd-size chunk padding, honest rejection of
 * malformed payloads, and a never-throws fuzz sweep.
 */
class WebpHeadersSpec extends AnyFunSuite {

  test("lossy build→parse round-trips 14-bit dimensions and RIFF size") {
    for ((w, h, extra) <- Seq((1, 1, 0), (16, 272, 7), (304, 16, 49),
        (0x3FFF, 0x3FFF, 100))) {
      val bytes = WebpHeaders.buildLossy(w, h, extra, seed = 11L)
      val m = WebpHeaders.parse(bytes).getOrElse(fail(s"parse failed w=$w"))
      assert(m.format == "lossy" && m.width == w && m.height == h)
      assert(!m.hasAlpha && m.nFrames == 1 && m.loopCount == 0)
      assert(m.riffBytes == bytes.length - 8) // RIFF size excludes its own header
    }
  }

  test("lossless build→parse round-trips packed minus-one fields and alpha") {
    for ((w, h, a) <- Seq((1, 1, false), (0x4000, 0x4000, true), (304, 16, true))) {
      val bytes = WebpHeaders.buildLossless(w, h, a, extraBytes = 3, seed = 5L)
      val m = WebpHeaders.parse(bytes).getOrElse(fail(s"parse failed w=$w"))
      assert(m.format == "lossless" && m.width == w && m.height == h)
      assert(m.hasAlpha == a && m.nFrames == 1)
    }
  }

  test("animated build→parse walks VP8X canvas, ANIM loop, and ANMF frames") {
    val bytes = WebpHeaders.buildAnimated(640, 480, hasAlpha = true,
      nFrames = 4, loopCount = 3, seed = 9L)
    val m = WebpHeaders.parse(bytes).get
    assert(m.format == "extended" && m.width == 640 && m.height == 480)
    assert(m.hasAlpha && m.nFrames == 4 && m.loopCount == 3)
    // canvas past the 14-bit subframe limit exercises the u24 fields
    val big = WebpHeaders.parse(WebpHeaders.buildAnimated(100000, 70000,
      hasAlpha = false, nFrames = 1, loopCount = 0, seed = 1L)).get
    assert(big.width == 100000 && big.height == 70000 && !big.hasAlpha)
  }

  test("odd-sized chunks carry a pad byte and still parse") {
    val odd = WebpHeaders.buildLossy(20, 20, extraBytes = 1, seed = 3L) // 11-byte payload
    val even = WebpHeaders.buildLossy(20, 20, extraBytes = 2, seed = 3L)
    assert(odd.length == even.length) // pad byte makes them equal
    assert(WebpHeaders.parse(odd).get.width == 20)
  }

  test("build rejects out-of-range dimensions instead of truncating") {
    intercept[IllegalArgumentException](WebpHeaders.buildLossy(0x4000, 10, 0, 1L))
    intercept[IllegalArgumentException](WebpHeaders.buildLossless(0x4001, 10, false, 0, 1L))
    intercept[IllegalArgumentException](
      WebpHeaders.buildAnimated(0x1000000, 10, false, 1, 0, 1L))
  }

  test("malformed payloads parse to None, never throw, never fabricate") {
    val good = WebpHeaders.buildLossy(32, 32, 10, 2L)
    val cases = Seq[Array[Byte]](
      null, Array.emptyByteArray, good.take(11), // too short
      { val b = good.clone(); b(0) = 'X'; b }, // not RIFF
      { val b = good.clone(); b(8) = 'A'; b }, // not WEBP
      { val b = good.clone(); b(19) = 0x7F.toByte; b }, // chunk size past EOF
      { val b = good.clone(); b(23) = 0; b }) // broken VP8 start code
    cases.foreach(c => assert(WebpHeaders.parse(c).isEmpty))
    // fuzz: random bytes and random truncations never throw
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val a = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(a)
      WebpHeaders.parse(a)
      WebpHeaders.parse(good.take(rnd.nextInt(good.length)))
    }
  }

  test("unknown chunks (ICCP/EXIF) are skipped, metadata still parses") {
    // splice an EXIF chunk after the VP8 chunk of a lossy file
    val base = WebpHeaders.buildLossy(48, 64, 0, 4L)
    val exif = Array[Byte]('E', 'X', 'I', 'F', 4, 0, 0, 0, 1, 2, 3, 4)
    val out = java.nio.ByteBuffer.allocate(base.length + exif.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(base, 0, 4).putInt(base.length - 8 + exif.length)
      .put(base, 8, base.length - 8).put(exif)
    val m = WebpHeaders.parse(out.array()).get
    assert(m.format == "lossy" && m.width == 48 && m.height == 64)
  }
}
