package graft.operators

import graft.operators.ImageCodec.RawImage

/**
 * Pure-JVM baseline JPEG codec (ITU-T T.81 / ISO 10918-1): the decode
 * path real multimodal corpora are dominated by, plus a deterministic
 * encoder so fixtures and the q179 oracle are self-contained. Brings
 * the JPEG story to parity with the PNG codec ([[ImageCodec]]):
 * curation stages that need pixels (perceptual hashing, brightness
 * gates, thumbnails) run on real JFIF payloads, not header parses
 * ([[ImageHeaders]] remains the cheap metadata screen).
 *
 * Decoder scope (documented, honest): baseline sequential DCT (SOF0),
 * 8-bit, 1 or 3 components, sampling factors 1–2 in each axis (covers
 * 4:4:4, 4:2:2, 4:4:0 and the ubiquitous 4:2:0), restart markers,
 * multiple DQT/DHT segments. Progressive (SOF2), arithmetic coding,
 * 12-bit, and 4-component (CMYK) payloads return None — never a
 * fabricated image. Chroma upsampling is pixel replication and the
 * IDCT is the exact double-precision reference transform — decoder
 * variance the JPEG spec explicitly permits (decoders need not be
 * bit-identical); the spec cross-checks against the JDK's decoder
 * within a per-pixel tolerance, and DC-only images (flat 8×8 blocks)
 * reconstruct EXACTLY, which is what the q179 synthesis oracle pins
 * per pixel.
 *
 * Encoder scope: grayscale or YCbCr 4:4:4 (no subsampling — every
 * block round-trips through the same math), Annex K quantization
 * tables scaled by the libjpeg quality formula, Annex K "typical"
 * Huffman tables, no restarts. Deterministic: same pixels + quality →
 * identical bytes.
 *
 * All rounding (quantization, color conversion, IDCT output) is
 * HALF-AWAY-FROM-ZERO, matching DuckDB's round() so the solid-block
 * quantization round-trip formula is reproducible by the oracle:
 * px' = clamp(round(round(8·(px−128)/Q0)·Q0/8) + 128, 0, 255).
 *
 * Reference scope note: PyAirbyte treats binary payloads as opaque
 * bytes (`airbyte/records.py` type failover); pixel decode is part of
 * the training-data surface this engine adds.
 */
object JpegCodec {

  // ------------------------------------------------------------ constants

  /** Zig-zag scan order: zigzag(i) = natural index of the i-th coeff. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K Table K.1 (luminance) in natural order. */
  private val BaseQLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K Table K.2 (chrominance) in natural order. */
  private val BaseQChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg quality scaling of a base table (public formula). */
  private[graft] def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      math.max(1, math.min(255, (v * scale + 50) / 100))
    }
  }

  // Annex K "typical" Huffman specs: (bits per code length 1..16, values)
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  private def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def clamp255(v: Long): Int = math.max(0L, math.min(255L, v)).toInt

  // precomputed DCT basis: cos((2x+1)·u·π/16) and C(u)
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cf: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  /** 0.25·C(u)·C(v), with the DC cell pinned to the EXACT 0.125 the
    * algebra gives (0.25·(1/√2)² drifts one ulp above 0.5/4 in float,
    * which flips quantization at exact .5 boundaries — the DC-only
    * round-trip must match the oracle's rational formula bit for bit). */
  private val ScaleUV: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, v) =>
      if (u == 0 && v == 0) 0.125 else 0.25 * Cf(u) * Cf(v))

  // ---------------------------------------------------------------- encode

  /** Canonical Huffman (code, length) per symbol from a BITS/VALS spec. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      val pad = 8 - nbits
      put((1 << pad) - 1, pad)
    }
  }

  /** Magnitude category + offset bits for a DC diff / AC coefficient. */
  private def magnitude(v: Long): (Int, Int) = {
    val a = math.abs(v)
    var cat = 0
    var t = a
    while (t != 0) { cat += 1; t >>= 1 }
    val bits = if (v >= 0) v.toInt else (v + (1L << cat) - 1).toInt
    (cat, bits)
  }

  private def fdctQuant(block: Array[Double], quant: Array[Int]): Array[Long] = {
    val out = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        val f = ScaleUV(u)(v) * s
        out(v * 8 + u) = roundHalfAway(f / quant(v * 8 + u))
        v += 1
      }
      u += 1
    }
    out
  }

  /**
   * Encode 1-channel (grayscale) or 3-channel (RGB → YCbCr 4:4:4)
   * images as baseline JFIF. Deterministic for fixed input + quality.
   */
  def encodeJpeg(img: RawImage, quality: Int = 75,
      restartInterval: Int = 0): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"JPEG encoder supports 1 or 3 channels, got ${img.channels}")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(body, 0, body.length)
    }
    val qLuma = scaledQuant(BaseQLuma, quality)
    val qChroma = scaledQuant(BaseQChroma, quality)
    val color = img.channels == 3

    marker(0xd8) // SOI
    // DQT (table 0 = luma; table 1 = chroma when color)
    def dqtBody(id: Int, q: Array[Int]): Array[Byte] = {
      val b = new Array[Byte](65)
      b(0) = id.toByte
      var i = 0
      while (i < 64) { b(1 + i) = q(Zigzag(i)).toByte; i += 1 }
      b
    }
    seg(0xdb, dqtBody(0, qLuma))
    if (color) seg(0xdb, dqtBody(1, qChroma))
    // SOF0
    val nComp = if (color) 3 else 1
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((img.height >> 8) & 0xff); sof.write(img.height & 0xff)
    sof.write((img.width >> 8) & 0xff); sof.write(img.width & 0xff)
    sof.write(nComp)
    for (c <- 0 until nComp) {
      sof.write(c + 1)    // component id
      sof.write(0x11)     // 4:4:4 — sampling 1x1 for every component
      sof.write(if (c == 0) 0 else 1) // quant table id
    }
    seg(0xc0, sof.toByteArray)
    // DHT
    def dhtBody(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((cls << 4) | id)
      for (l <- 1 to 16) b.write(bits(l))
      b.write(vals, 0, vals.length)
      b.toByteArray
    }
    seg(0xc4, dhtBody(0, 0, DcLumaBits, DcLumaVals))
    seg(0xc4, dhtBody(1, 0, AcLumaBits, AcLumaVals))
    if (color) {
      seg(0xc4, dhtBody(0, 1, DcChromaBits, DcChromaVals))
      seg(0xc4, dhtBody(1, 1, AcChromaBits, AcChromaVals))
    }
    // DRI (optional: exercises the decoder's restart path)
    if (restartInterval > 0)
      seg(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nComp)
    for (c <- 0 until nComp) {
      sos.write(c + 1)
      sos.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
    }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection (baseline)
    seg(0xda, sos.toByteArray)

    // entropy-coded data: 4:4:4 MCU = one 8x8 block per component
    val dcEnc = Array(buildEncodeTable(DcLumaBits, DcLumaVals),
      buildEncodeTable(DcChromaBits, DcChromaVals))
    val acEnc = Array(buildEncodeTable(AcLumaBits, AcLumaVals),
      buildEncodeTable(AcChromaBits, AcChromaVals))
    val quants = Array(qLuma, qChroma)
    val bw = new BitWriter(out)
    val mcuW = (img.width + 7) / 8
    val mcuH = (img.height + 7) / 8
    // component planes in YCbCr (or just Y), level-shifted later
    val planes: Array[Array[Int]] = if (!color) {
      Array(Array.tabulate(img.width * img.height)(i => img.pixels(i) & 0xff))
    } else {
      val n = img.width * img.height
      val y = new Array[Int](n); val cb = new Array[Int](n); val cr = new Array[Int](n)
      var i = 0
      while (i < n) {
        val r = img.pixels(3 * i) & 0xff
        val g = img.pixels(3 * i + 1) & 0xff
        val b = img.pixels(3 * i + 2) & 0xff
        y(i) = clamp255(roundHalfAway(0.299 * r + 0.587 * g + 0.114 * b))
        cb(i) = clamp255(roundHalfAway(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
        cr(i) = clamp255(roundHalfAway(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
        i += 1
      }
      Array(y, cb, cr)
    }
    val dcPred = new Array[Long](nComp)
    val block = new Array[Double](64)
    var mcuIdx = 0
    var rstIdx = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (rstIdx % 8))
          rstIdx += 1
          java.util.Arrays.fill(dcPred, 0L)
        }
        mcuIdx += 1
        var c = 0
        while (c < nComp) {
          val tid = if (c == 0) 0 else 1
          // fill the block with edge-clamped, level-shifted samples
          var by = 0
          while (by < 8) {
            val sy = math.min(img.height - 1, my * 8 + by)
            var bx = 0
            while (bx < 8) {
              val sx = math.min(img.width - 1, mx * 8 + bx)
              block(by * 8 + bx) = planes(c)(sy * img.width + sx) - 128.0
              bx += 1
            }
            by += 1
          }
          val coefs = fdctQuant(block, quants(tid))
          // DC
          val diff = coefs(0) - dcPred(c)
          dcPred(c) = coefs(0)
          val (cat, bits) = magnitude(diff)
          val (dcode, dlen) = dcEnc(tid)(cat)
          bw.put(dcode, dlen)
          if (cat > 0) bw.put(bits, cat)
          // AC, zig-zag order with run-lengths
          var run = 0
          var k = 1
          while (k < 64) {
            val v = coefs(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                val (z, zl) = acEnc(tid)(0xf0); bw.put(z, zl); run -= 16
              }
              val (acat, abits) = magnitude(v)
              val (acode, alen) = acEnc(tid)((run << 4) | acat)
              bw.put(acode, alen)
              bw.put(abits, acat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (e, el) = acEnc(tid)(0x00); bw.put(e, el) } // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // spec F.2.2.3 decode tables: min/max code per length + value index
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker = false
    /** Next entropy bit; handles 0xFF00 stuffing. Throws at segment end. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new ArrayIndexOutOfBoundsException(pos)
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new ArrayIndexOutOfBoundsException(pos)
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed byte
          else { sawMarker = true; pos -= 1; b = 0xff } // marker reached:
          // back up so pos points AT the marker's 0xff; the current
          // block finishes on pad bits and the MCU loop checks sawMarker
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) == -1 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      if (len > 16) throw new IllegalStateException("bad Huffman code")
      t.value(len, code)
    }
    /** DC/AC magnitude extension (spec F.2.2.1 EXTEND). */
    def extend(v: Int, cat: Int): Int =
      if (cat == 0) 0
      else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
      else v
    def alignToByte(): Unit = nbits = 0
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  /** Decode a baseline JFIF payload; None on anything malformed or out
    * of the documented scope — never partial, never throws. */
  def decodeJpeg(bytes: Array[Byte]): Option[RawImage] =
    try decodeInternal(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Dev-only: decode without the catch, surfacing the failure. */
  private[graft] def debugDecode(bytes: Array[Byte]): Option[RawImage] =
    decodeInternal(bytes)

  private def decodeInternal(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quants = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => return None // EOI before any scan decoded
        case 0x01 => () // TEM, standalone
        case x if x >= 0xd0 && x <= 0xd7 => () // stray RST, standalone
        case 0xc0 => // SOF0: baseline
          val end = { val len = u16(); pos + len - 2 }
          if (u8() != 8) return None // precision
          height = u16(); width = u16()
          if (width <= 0 || height <= 0) return None
          val n = u8()
          if (n != 1 && n != 3) return None
          // Same decode-size budget as the PNG path (ImageCodec.scala): a
          // ~100-byte stream can declare 40000x40000 and force ~10 GB of
          // plane allocations; OutOfMemoryError is an Error and would
          // escape the never-throws contract, so refuse before allocating.
          // The long product also sidesteps Int overflow in width*height.
          if (width.toLong * height * n > 64L * 1024 * 1024) return None
          comps = Array.fill(n)(null)
          for (i <- 0 until n) {
            val id = u8(); val hv = u8(); val tq = u8()
            val h = (hv >> 4) & 0xf; val v = hv & 0xf
            if (h < 1 || h > 2 || v < 1 || v > 2 || tq > 3) return None
            comps(i) = Component(id, h, v, tq)
          }
          if (pos != end) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
            0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // non-baseline SOF: out of scope, never fabricate
        case 0xc4 => // DHT (possibly several tables per segment)
          val end = { val len = u16(); pos + len - 2 }
          while (pos < end) {
            val tc = u8()
            val cls = (tc >> 4) & 0xf; val id = tc & 0xf
            if (cls > 1 || id > 3) return None
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = u8(); total += bits(l) }
            if (total > 256 || pos + total > end) return None
            val vals = java.util.Arrays.copyOfRange(bytes, pos, pos + total)
            pos += total
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = t else acTables(id) = t
          }
          if (pos != end) return None
        case 0xdb => // DQT (possibly several tables per segment)
          val end = { val len = u16(); pos + len - 2 }
          while (pos < end) {
            val pq = u8()
            val prec = (pq >> 4) & 0xf; val id = pq & 0xf
            if (prec != 0 || id > 3) return None // 8-bit tables only
            if (pos + 64 > end) return None
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = u8(); i += 1 }
            quants(id) = q
          }
          if (pos != end) return None
        case 0xdd => // DRI
          if (u16() != 4) return None
          restartInterval = u16()
        case 0xda => // SOS: decode the single baseline scan
          val end = { val len = u16(); pos + len - 2 }
          if (comps == null) return None
          val ns = u8()
          if (ns != comps.length) return None // interleaved full scan only
          for (_ <- 0 until ns) {
            val cs = u8(); val tt = u8()
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTable = (tt >> 4) & 0xf
            c.acTable = tt & 0xf
          }
          pos += 3 // Ss/Se/Ah-Al: fixed 0/63/0 in baseline; tolerate values
          if (pos != end) return None
          return decodeScan(bytes, pos, width, height, comps, quants,
            dcTables, acTables, restartInterval)
        case _ => // APPn, COM, and other skippable segments
          val len = u16()
          if (len < 2) return None
          pos += len - 2
      }
    }
    None // no SOS reached
  }

  private def decodeScan(bytes: Array[Byte], start: Int,
      width: Int, height: Int, comps: Array[Component],
      quants: Array[Array[Int]], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int): Option[RawImage] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component planes at FULL resolution (upsampled on write)
    val planes = comps.map(_ => new Array[Byte](width * height))
    comps.foreach { c =>
      if (quants(c.tq) == null) return None
    }
    val br = new BitReader(bytes, start)
    val dcPred = new Array[Int](comps.length)
    val coefs = new Array[Int](64)
    val pix = new Array[Double](64)

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn: align, consume the marker, reset DC predictions
        br.alignToByte()
        var p = br.pos
        // tolerate fill bytes before the marker
        while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
          (bytes(p + 1) & 0xff) == 0xff) p += 1
        if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff) return None
        val m = bytes(p + 1) & 0xff
        if (m < 0xd0 || m > 0xd7) return None
        br.pos = p + 2
        br.sawMarker = false
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcT = dcTables(c.dcTable)
        val acT = acTables(c.acTable)
        if (dcT == null || acT == null) return None
        val q = quants(c.tq)
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            // ---- one 8x8 block
            java.util.Arrays.fill(coefs, 0)
            val cat = br.decodeHuff(dcT)
            if (cat > 11) return None
            val diff = br.extend(br.bits(cat), cat)
            dcPred(ci) += diff
            coefs(0) = dcPred(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decodeHuff(acT)
              val run = (rs >> 4) & 0xf
              val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return None
                val level = br.extend(br.bits(size), size)
                coefs(Zigzag(k)) = level * q(Zigzag(k))
                k += 1
              }
            }
            // ---- IDCT (exact double-precision reference transform)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var s = 0.0
                var u = 0
                while (u < 8) {
                  var v = 0
                  while (v < 8) {
                    val cc = coefs(v * 8 + u)
                    if (cc != 0) s += ScaleUV(u)(v) * cc * CosT(x)(u) * CosT(y)(v)
                    v += 1
                  }
                  u += 1
                }
                pix(y * 8 + x) = s
                x += 1
              }
              y += 1
            }
            // ---- write into the full-res plane with replication upsampling
            val scaleX = hmax / c.h
            val scaleY = vmax / c.v
            val originX = (mx * c.h + bh) * 8
            val originY = (my * c.v + bv) * 8
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                val sample = clamp255(roundHalfAway(pix(by * 8 + bx) + 128.0)).toByte
                // each decoded sample covers a scaleX × scaleY patch
                var ry = 0
                while (ry < scaleY) {
                  val py = (originY + by) * scaleY + ry
                  if (py < height) {
                    var rx = 0
                    while (rx < scaleX) {
                      val px = (originX + bx) * scaleX + rx
                      if (px < width) planes(ci)(py * width + px) = sample
                      rx += 1
                    }
                  }
                  ry += 1
                }
                bx += 1
              }
              by += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      if (br.sawMarker && mcu < totalMcus - 1 &&
          !(restartInterval > 0 && (mcu + 1) % restartInterval == 0))
        return None // hit EOI/marker with MCUs left and no restart due
      mcu += 1
    }

    if (comps.length == 1) {
      Some(RawImage(width, height, 1, planes(0)))
    } else {
      val out = new Array[Byte](width * height * 3)
      var i = 0
      val n = width * height
      while (i < n) {
        val y = planes(0)(i) & 0xff
        val cb = (planes(1)(i) & 0xff) - 128
        val cr = (planes(2)(i) & 0xff) - 128
        out(3 * i) = clamp255(roundHalfAway(y + 1.402 * cr)).toByte
        out(3 * i + 1) = clamp255(roundHalfAway(y - 0.344136 * cb - 0.714136 * cr)).toByte
        out(3 * i + 2) = clamp255(roundHalfAway(y + 1.772 * cb)).toByte
        i += 1
      }
      Some(RawImage(width, height, 3, out))
    }
  }
}
