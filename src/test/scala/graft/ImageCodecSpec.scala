package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioHeaders, ImageCodec, ImageOps}
import graft.operators.ImageCodec.RawImage

/**
 * Pure-JVM PNG codec + pixel-kernel contract. The codec is the real
 * decode path behind the media queries (q166-q168); beyond the DuckDB
 * oracle gate, this spec pins the properties the oracle cannot see:
 * exact pixel round-trips through deflate + all five scanline filters,
 * honest rejection of malformed/out-of-scope payloads, and the
 * brightness-invariance law of the perceptual hashes.
 */
class ImageCodecSpec extends AnyFunSuite {

  private def noiseImage(seed: Long, w: Int, h: Int, ch: Int): RawImage = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) {
      px(i) = ((seed * 31 + i.toLong * 131) % 251).toByte
      i += 1
    }
    RawImage(w, h, ch, px)
  }

  test("PNG round-trip is pixel-exact for gray/RGB/RGBA at awkward sizes") {
    // heights ≥ 5 cover every filter (encoder cycles y % 5); width 1
    // and odd widths stress the bpp-offset arithmetic in Sub/Paeth
    for {
      ch <- Seq(1, 3, 4)
      (w, h) <- Seq((1, 7), (3, 5), (17, 6), (32, 24), (5, 1))
    } {
      val img = noiseImage(seed = ch * 100 + w, w, h, ch)
      val decoded = ImageCodec.decodePng(ImageCodec.encodePng(img))
      assert(decoded.isDefined, s"decode failed ch=$ch w=$w h=$h")
      val d = decoded.get
      assert(d.width == w && d.height == h && d.channels == ch)
      assert(d.pixels.sameElements(img.pixels), s"pixels drift ch=$ch w=$w h=$h")
    }
  }

  test("decode rejects malformed and out-of-scope payloads, never fabricates") {
    val good = ImageCodec.encodePng(noiseImage(1, 8, 8, 3))
    assert(ImageCodec.decodePng(null).isEmpty)
    assert(ImageCodec.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.decodePng(good.take(good.length - 9)).isEmpty) // truncated
    val badCrc = good.clone(); badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0x01).toByte
    val corruptIdat = good.clone(); corruptIdat(40) = (corruptIdat(40) ^ 0x7f).toByte
    assert(ImageCodec.decodePng(corruptIdat).isEmpty) // CRC catches payload flip
    val interlaced = good.clone(); interlaced(28) = 1 // IHDR interlace flag
    assert(ImageCodec.decodePng(interlaced).isEmpty)  // (also breaks CRC)
    val jpegish = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ new Array[Byte](32)
    assert(ImageCodec.decodePng(jpegish).isEmpty)
  }

  test("adversarial containers return None: overflow lengths, FDICT streams") {
    // chunk length near Int.MaxValue: the bounds check must use long
    // arithmetic, not wrap negative and crash inside CRC32.update
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val huge = sig ++ Array(0x7f, 0xff, 0xff, 0xf0).map(_.toByte) ++
      "IHDR".getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(ImageCodec.decodePng(huge).isEmpty) // None, not an exception
    // zlib FDICT bit set in the IDAT stream: PNG forbids preset
    // dictionaries; the inflater must reject, not spin forever
    val good = ImageCodec.encodePng(noiseImage(5, 8, 8, 1))
    def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    // locate IDAT (sig + IHDR chunk = 8 + 25 bytes in our encoder)
    val idatPos = 8 + 25
    assert(new String(good, idatPos + 4, 4, "US-ASCII") == "IDAT")
    val idatLen = be32(good, idatPos)
    val tampered = good.clone()
    // set FDICT (bit 5 of FLG) and repair FCHECK so (CMF·256+FLG)%31==0
    val cmf = tampered(idatPos + 8) & 0xff
    var flg = (tampered(idatPos + 9) & 0xff) | 0x20
    flg = (flg & 0xe0) | ((31 - (cmf * 256 + (flg & 0xe0)) % 31) % 31)
    tampered(idatPos + 9) = flg.toByte
    val crc = new java.util.zip.CRC32()
    crc.update(tampered, idatPos + 4, 4 + idatLen)
    val crcv = crc.getValue.toInt
    tampered(idatPos + 8 + idatLen) = (crcv >>> 24).toByte
    tampered(idatPos + 9 + idatLen) = (crcv >>> 16).toByte
    tampered(idatPos + 10 + idatLen) = (crcv >>> 8).toByte
    tampered(idatPos + 11 + idatLen) = crcv.toByte
    val t0 = System.nanoTime()
    assert(ImageCodec.decodePng(tampered).isEmpty)
    assert((System.nanoTime() - t0) < 5e9, "decode stalled on FDICT stream")
  }

  test("decoded PNGs agree with the header-only parser on dimensions") {
    val img = noiseImage(7, 19, 11, 1)
    val png = ImageCodec.encodePng(img)
    val header = graft.operators.ImageHeaders.parse(png)
    assert(header.contains(graft.operators.ImageHeaders.ImageMeta("png", 19, 11)))
  }

  test("toGray: BT.601 integer luma; alpha ignored; gray passes through") {
    val rgb = RawImage(1, 1, 3, Array(100.toByte, 200.toByte, 50.toByte))
    assert((ImageOps.toGray(rgb).pixels(0) & 0xff) ==
      (299 * 100 + 587 * 200 + 114 * 50) / 1000)
    val rgba = RawImage(1, 1, 4, Array(100.toByte, 200.toByte, 50.toByte, 9.toByte))
    assert(ImageOps.toGray(rgba).pixels(0) == ImageOps.toGray(rgb).pixels(0))
    val gray = noiseImage(3, 4, 4, 1)
    assert(ImageOps.toGray(gray) eq gray)
  }

  test("resizeAreaAvg: uniform stays uniform; 2x2 block means are exact") {
    val flat = RawImage(10, 6, 1, Array.fill(60)(77.toByte))
    assert(ImageOps.resizeAreaAvg(flat, 3, 2).forall(_ == 77))
    val img = RawImage(2, 2, 1, Array(10, 20, 30, 40).map(_.toByte))
    assert(ImageOps.resizeAreaAvg(img, 1, 1).sameElements(Array(25)))
    // non-divisible partition: cells cover [0,1) and [1,3) of width 3
    val row = RawImage(3, 1, 1, Array(12, 30, 60).map(_.toByte))
    assert(ImageOps.resizeAreaAvg(row, 2, 1).sameElements(Array(12, 45)))
  }

  test("aHash/dHash: identical content hashes identically; brightness shift is invariant") {
    val a = ImageOps.toGray(noiseImage(11, 40, 30, 3))
    val b = ImageOps.toGray(noiseImage(11, 40, 30, 3))
    assert(ImageOps.aHash64(a) == ImageOps.aHash64(b))
    assert(ImageOps.dHash64(a) == ImageOps.dHash64(b))
    assert(ImageOps.hamming(ImageOps.dHash64(a), ImageOps.dHash64(b)) == 0)
    // +c on every pixel (no clipping: source < 251, shift 4) moves every
    // cell average and the global mean by exactly c → both hashes fixed
    val shifted = RawImage(a.width, a.height, 1,
      a.pixels.map(p => ((p & 0xff) + 4).toByte))
    assert(ImageOps.aHash64(shifted) == ImageOps.aHash64(a))
    assert(ImageOps.dHash64(shifted) == ImageOps.dHash64(a))
    // independent noise is far apart — the separation the near-dup
    // radius (≤4) relies on
    val other = ImageOps.toGray(noiseImage(99, 40, 30, 3))
    assert(ImageOps.hamming(ImageOps.dHash64(a), ImageOps.dHash64(other)) > 10)
  }

  test("pcm16Samples: WAV sample round-trip is exact, incl. negative values") {
    val samples = Array.tabulate(300)(i => (i * 37 % 2001 - 1000).toShort)
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val wav = AudioHeaders.buildWav(data, channels = 1, sampleRate = 8000)
    val back = AudioHeaders.pcm16Samples(wav)
    assert(back.isDefined)
    assert(back.get.sameElements(samples))
    assert(AudioHeaders.pcm16Samples(wav.take(50)).isEmpty) // truncated
    assert(AudioHeaders.pcm16Samples(
      ImageCodec.encodePng(noiseImage(1, 4, 4, 1))).isEmpty) // not a WAV
  }
}
