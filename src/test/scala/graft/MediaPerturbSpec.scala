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
}
