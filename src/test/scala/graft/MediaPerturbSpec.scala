package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/**
 * The q178 premise, pinned directly: brightness-perturbed copies of
 * the same image content have DIFFERENT bytes (so exact/content-hash
 * dedup cannot pair them) but IDENTICAL dHash/aHash (so the
 * perceptual pipeline does). Classes = 40 over ids < 80 gives every
 * class exactly two copies with opposite shift parity.
 */
class MediaPerturbSpec extends SparkTestBase {

  test("perturbed copies: bytes differ, perceptual hashes agree") {
    val docs = graft.sources.Tables.documents(spark, sf())
      .filter(col("doc_id") < 80)
    val media = Multimodal.synthNoisePng(docs, "doc_id", classes = 40,
      perturbBrightness = true)
    val sums = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("checksum")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashes = Multimodal.decodeImageHashes(media).toDF().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 40L).foreach { cls =>
      val (a, b) = (cls, cls + 40)
      assert(sums(a) != sums(b),
        s"class $cls: copies should differ in bytes (+4 shift)")
      assert(hashes(a) == hashes(b),
        s"class $cls: aHash/dHash must be brightness-shift invariant")
    }
  }

  test("perceptual hashing runs on JPEG payloads via format dispatch") {
    import graft.operators.{ImageCodec, JpegCodec, ImageOps}
    // identical pixels through both containers: PNG is lossless, JPEG
    // at high quality distorts only slightly — area-average hashes of
    // the two decodes must be near-identical (the cross-format dedup
    // property the dispatch exists for)
    val rnd = new scala.util.Random(11)
    val px = Array.fill(32 * 24)(rnd.nextInt(256).toByte)
    val img = ImageCodec.RawImage(32, 24, 1, px)
    val viaPng = ImageCodec.decodeImage(ImageCodec.encodePng(img)).get
    val viaJpeg = ImageCodec.decodeImage(JpegCodec.encodeJpeg(img, 95)).get
    val hPng = ImageOps.dHash64(ImageOps.toGray(viaPng))
    val hJpeg = ImageOps.dHash64(ImageOps.toGray(viaJpeg))
    assert(ImageOps.hamming(hPng, hJpeg) <= 4,
      s"cross-container dHash distance ${ImageOps.hamming(hPng, hJpeg)}")
  }

  test("dhash banding guarantees recall at the full verify radius (4 bits)") {
    import spark.implicits._
    // Adversarial spread: exactly 4 differing bits, one per 16-bit
    // quarter — the pair a 4-band pigeonhole scheme silently drops
    // (no quarter is clean), caught only because 5 bands guarantee a
    // clean band up to radius 4 (round-4 advisor finding).
    val h1 = 0x0123456789abcdefL
    val spread4 = h1 ^ ((1L << 5) | (1L << 20) | (1L << 35) | (1L << 50))
    // and a pair at distance 5 (one per 13-bit band): must be DROPPED
    // by the verify filter even though bands may collide
    val spread5 = h1 ^ ((1L << 1) | (1L << 14) | (1L << 27) | (1L << 40) | (1L << 53))
    val hashes = Seq((1L, h1), (2L, spread4), (3L, spread5))
      .toDF("media_id", "dhash")
    val pairs = graft.queries.MediaQueries.dhashBandPairs(hashes)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "distance-4 spread pair must be recalled")
    assert(!pairs.contains((1L, 3L)), "distance-5 pair must fail the verify radius")
  }
}
