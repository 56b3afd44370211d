package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TiffHeaders

/** TIFF 6.0 baseline codec: build→parse round-trips in both byte
  * orders; malformed input fails honestly; fuzz never throws. */
class TiffHeadersSpec extends AnyFunSuite {

  test("build→parse round-trips dims, orientation, resolution — both byte orders") {
    for {
      le <- Seq(true, false)
      (w, h, o, x) <- Seq((16, 16, 1, 72), (640, 480, 6, 144), (4096, 2160, 8, 300))
    } {
      val bytes = TiffHeaders.buildTiff(w, h, o, x, le)
      val m = TiffHeaders.parse(bytes).getOrElse(fail(s"parse failed le=$le w=$w"))
      assert(m.byteOrder == (if (le) "II" else "MM"))
      assert(m.width == w && m.height == h && m.orientation == o)
      assert(m.bitsPerSample == 8 && m.nEntries == 6)
      assert(m.xResNum == x && m.xResDen == 1)
    }
  }

  test("build rejects out-of-range params") {
    intercept[IllegalArgumentException](TiffHeaders.buildTiff(0, 1, 1, 72, true))
    intercept[IllegalArgumentException](TiffHeaders.buildTiff(1, 1, 0, 72, true))
    intercept[IllegalArgumentException](TiffHeaders.buildTiff(1, 1, 9, 72, true))
  }

  test("rejects malformed payloads honestly, never fabricates") {
    assert(TiffHeaders.parse(null).isEmpty)
    assert(TiffHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(TiffHeaders.parse("not a tiff at all".getBytes("UTF-8")).isEmpty)
    // right signature, wrong magic
    val badMagic = TiffHeaders.buildTiff(8, 8, 1, 72, true)
    badMagic(2) = 41
    assert(TiffHeaders.parse(badMagic).isEmpty)
    // IFD offset pointing past the file
    val badIfd = TiffHeaders.buildTiff(8, 8, 1, 72, true)
    badIfd(4) = 0x7F.toByte
    assert(TiffHeaders.parse(badIfd).isEmpty)
    // a PNG signature (valid container of the WRONG format) must not parse
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R')
    assert(TiffHeaders.parse(png).isEmpty)
  }

  test("fuzz: truncations and bit-flips never throw") {
    val base = TiffHeaders.buildTiff(320, 240, 3, 144, false)
    for (len <- 0 until base.length)
      TiffHeaders.parse(base.take(len)) // must not throw
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val b = base.clone()
      val i = rnd.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      TiffHeaders.parse(b) // must not throw; may be None or wrong-but-bounded
    }
  }

  test("unknown tags are skipped; absent orientation defaults to 1") {
    // hand-build: II header, one IFD with ONLY width+height+a private tag
    val buf = java.nio.ByteBuffer.allocate(8 + 2 + 3 * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    buf.putShort(3)
    buf.putShort(256).putShort(4).putInt(1).putInt(99) // width LONG
    buf.putShort(257).putShort(4).putInt(1).putInt(77) // height LONG
    buf.putShort(0x8769.toShort).putShort(4).putInt(1).putInt(0) // ExifIFD ptr (skipped)
    buf.putInt(0)
    val m = TiffHeaders.parse(buf.array()).getOrElse(fail("minimal tiff must parse"))
    assert(m.width == 99 && m.height == 77)
    assert(m.orientation == 1 && m.bitsPerSample == 1) // spec defaults
  }
}
