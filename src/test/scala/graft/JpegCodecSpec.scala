package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ImageCodec, JpegCodec}
import graft.operators.ImageCodec.RawImage

/**
 * Baseline JPEG codec gates:
 *  - DC-only (solid) images reconstruct EXACTLY via the quantization
 *    round-trip formula — the q166-style per-pixel contract the q179
 *    oracle recomputes in DuckDB;
 *  - general content cross-checks against the JDK's independent codec
 *    (javax.imageio) within the small per-pixel tolerance the JPEG
 *    spec permits between conforming decoders;
 *  - fuzz/truncation never throws and never fabricates an image.
 */
class JpegCodecSpec extends AnyFunSuite {

  /** The documented solid-gray round-trip: what a flat block of value v
    * decodes to after quantization at `quality` (DC-only algebra). */
  private def solidRoundTrip(v: Int, quality: Int): Int = {
    val q0 = JpegCodec.scaledQuant(Array.fill(64)(16), quality)(0) // Q(0,0) base 16
    def rnd(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val qdc = rnd(8.0 * (v - 128) / q0)
    math.max(0L, math.min(255L, rnd(qdc * q0 / 8.0) + 128)).toInt
  }

  private def gray(w: Int, h: Int, v: Int): RawImage =
    RawImage(w, h, 1, Array.fill(w * h)(v.toByte))

  test("solid grayscale blocks reconstruct exactly per the quantization formula") {
    for (q <- Seq(50, 75, 90); v <- Seq(0, 3, 77, 128, 200, 255);
         (w, h) <- Seq((8, 8), (24, 16), (13, 9), (31, 17))) {
      val img = gray(w, h, v)
      val back = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img, q))
        .getOrElse(fail(s"decode failed q=$q v=$v ${w}x$h"))
      assert(back.width == w && back.height == h && back.channels == 1)
      val want = solidRoundTrip(v, q)
      assert(back.pixels.forall(p => (p & 0xff) == want),
        s"q=$q v=$v ${w}x$h: expected uniform $want, got ${back.pixels.map(_ & 0xff).distinct.toSeq}")
    }
  }

  test("restart markers: round-trip with DRI equals round-trip without") {
    val rnd = new scala.util.Random(7)
    val img = RawImage(40, 24, 1, Array.fill(40 * 24)(rnd.nextInt(256).toByte))
    val plain = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img, 85)).get
    val rst = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(img, 85, restartInterval = 3)).get
    assert(plain.pixels.sameElements(rst.pixels),
      "restart segmentation must not change decoded pixels")
  }

  private def toBuffered(img: RawImage): java.awt.image.BufferedImage = {
    val t = if (img.channels == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val bi = new java.awt.image.BufferedImage(img.width, img.height, t)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val i = (y * img.width + x) * img.channels
      val rgb = if (img.channels == 1) {
        val v = img.pixels(i) & 0xff; (v << 16) | (v << 8) | v
      } else {
        ((img.pixels(i) & 0xff) << 16) | ((img.pixels(i + 1) & 0xff) << 8) |
          (img.pixels(i + 2) & 0xff)
      }
      bi.setRGB(x, y, rgb)
    }
    bi
  }

  private def imageioJpeg(img: RawImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(toBuffered(img), null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  private def imageioDecode(bytes: Array[Byte]): Option[RawImage] = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (bi == null) None
    else {
      val (w, h) = (bi.getWidth, bi.getHeight)
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = bi.getRGB(x, y)
        val i = (y * w + x) * 3
        px(i) = ((rgb >> 16) & 0xff).toByte
        px(i + 1) = ((rgb >> 8) & 0xff).toByte
        px(i + 2) = (rgb & 0xff).toByte
      }
      Some(RawImage(w, h, 3, px))
    }
  }

  private def gradient(w: Int, h: Int): RawImage = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      px(i) = ((x * 255) / math.max(1, w - 1)).toByte
      px(i + 1) = ((y * 255) / math.max(1, h - 1)).toByte
      px(i + 2) = (((x + y) * 255) / math.max(1, w + h - 2)).toByte
    }
    RawImage(w, h, 3, px)
  }

  test("decodes the JDK encoder's 4:2:0 output within decoder tolerance") {
    // ImageIO writes 4:2:0 chroma subsampling by default — the shape
    // real corpora are full of and the reason the decoder supports
    // sampling factors; compare against the JDK's own decode of the
    // same bytes (conforming decoders may differ slightly: different
    // IDCT + chroma upsampling).
    val img = gradient(48, 32)
    val jpeg = imageioJpeg(img, 0.85f)
    val mine = JpegCodec.decodeJpeg(jpeg)
      .getOrElse(fail("decoder rejected a JDK-encoded baseline JPEG"))
    val ref = imageioDecode(jpeg).get
    assert(mine.width == ref.width && mine.height == ref.height && mine.channels == 3)
    val diffs = mine.pixels.zip(ref.pixels).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    val mean = diffs.map(_.toLong).sum.toDouble / diffs.length
    assert(mean <= 3.0, s"mean abs diff $mean vs JDK decoder")
    assert(diffs.count(_ > 16) <= diffs.length / 100,
      s"too many outliers vs JDK decoder: ${diffs.count(_ > 16)} of ${diffs.length}")
  }

  test("the JDK decoder accepts and agrees with our encoder's output") {
    val img = gradient(40, 25)
    val jpeg = JpegCodec.encodeJpeg(img, 90)
    val ref = imageioDecode(jpeg).getOrElse(fail("JDK rejected our JPEG"))
    val mine = JpegCodec.decodeJpeg(jpeg).get
    val diffs = mine.pixels.zip(ref.pixels).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }
    val mean = diffs.map(_.toLong).sum.toDouble / diffs.length
    assert(mean <= 2.0, s"mean abs diff $mean between our decode and the JDK's")
    assert(diffs.max <= 16, s"max diff ${diffs.max} (4:4:4 — only IDCT variance expected)")
  }

  test("grayscale round-trip through the JDK decoder") {
    val px = Array.tabulate(32 * 24)(i => ((i * 7) % 256).toByte)
    val img = RawImage(32, 24, 1, px)
    val jpeg = JpegCodec.encodeJpeg(img, 90)
    val mine = JpegCodec.decodeJpeg(jpeg).get
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(bi != null && bi.getWidth == 32 && bi.getHeight == 24)
    var worst = 0
    for (y <- 0 until 24; x <- 0 until 32) {
      // raster sample, not getRGB: the JDK converts gray -> sRGB
      // through a nonlinear colorspace transform
      val refv = bi.getRaster.getSample(x, y, 0)
      val got = mine.pixels(y * 32 + x) & 0xff
      worst = math.max(worst, math.abs(refv - got))
    }
    assert(worst <= 2, s"gray decode diverges from JDK by $worst")
  }

  test("fuzz: arbitrary and truncated bytes never throw, never fabricate") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(400)
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      JpegCodec.decodeJpeg(junk) // must not throw
      // junk dressed as a JPEG
      if (n >= 2) { junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte }
      JpegCodec.decodeJpeg(junk)
    }
    val valid = JpegCodec.encodeJpeg(gradient(24, 16), 75)
    (0 until valid.length by 7).foreach { cut =>
      JpegCodec.decodeJpeg(valid.take(cut)) // truncations must not throw
    }
    // flipped bytes must not throw either (wrong pixels are permitted
    // only for flips INSIDE entropy data; structural flips reject)
    (0 until valid.length by 11).foreach { i =>
      val mut = valid.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
      JpegCodec.decodeJpeg(mut)
    }
    assert(JpegCodec.decodeJpeg(Array[Byte]()).isEmpty)
    assert(JpegCodec.decodeJpeg(null).isEmpty)
  }

  test("out-of-scope shapes are rejected, never fabricated") {
    // progressive (SOF2) from the JDK? The JDK writes baseline; craft a
    // minimal SOF2 by patching our own output's SOF0 marker
    val valid = JpegCodec.encodeJpeg(gray(16, 16, 99), 75)
    val idx = (0 until valid.length - 1).find(i =>
      (valid(i) & 0xff) == 0xff && (valid(i + 1) & 0xff) == 0xc0).get
    val progressive = valid.clone(); progressive(idx + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(progressive).isEmpty)
    // PNG bytes are not a JPEG
    val png = ImageCodec.encodePng(gray(8, 8, 10))
    assert(JpegCodec.decodeJpeg(png).isEmpty)
  }

  test("decode-size bomb: a tiny stream declaring huge SOF dimensions is refused before allocating") {
    // a real ~600-byte stream whose SOF0 we patch to claim 40000x40000
    // (~4.8 GB of planes if believed) — the 64 MiB cap must return None
    // without attempting the allocation
    def withDims(h: Int, w: Int): Array[Byte] = {
      val valid = JpegCodec.encodeJpeg(gray(16, 16, 99), 75)
      val idx = (0 until valid.length - 1).find(i =>
        (valid(i) & 0xff) == 0xff && (valid(i + 1) & 0xff) == 0xc0).get
      val bomb = valid.clone()
      // SOF0 layout: FF C0 | len(2) | precision(1) | height(2) | width(2)
      bomb(idx + 5) = ((h >> 8) & 0xff).toByte; bomb(idx + 6) = (h & 0xff).toByte
      bomb(idx + 7) = ((w >> 8) & 0xff).toByte; bomb(idx + 8) = (w & 0xff).toByte
      bomb
    }
    val t0 = System.nanoTime()
    assert(JpegCodec.decodeJpeg(withDims(40000, 40000)).isEmpty)
    // 65535x65535 is the max encodable SOF and overflows Int in w*h —
    // the long-product guard must still refuse cleanly
    assert(JpegCodec.decodeJpeg(withDims(65535, 65535)).isEmpty)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs < 2000, s"size-capped rejects must be immediate, took ${elapsedMs}ms")
    // sanity: the unpatched stream still decodes (the cap is not overzealous)
    assert(JpegCodec.decodeJpeg(withDims(16, 16)).isDefined)
  }
}
