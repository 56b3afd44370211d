package graft

import graft.streaming.StreamingBloom

/** Cross-batch Bloom membership: batched fold equals one-shot, no
  * false negatives, replays and shard merges are idempotent, state
  * persists/restores with a (p,k) guard. */
class StreamingBloomSpec extends SparkTestBase {

  import spark.implicits._

  test("no false negatives; batched fold equals one-shot; replay idempotent") {
    val sb = new StreamingBloom(p = 14, k = 4)
    val keys = (1L to 2000L).map(_ * 1315423911L)
    keys.grouped(500).foreach { b =>
      sb.processBatch(spark.createDataset(b).toDF("key"))
    }
    assert(keys.forall(sb.mightContain),
      "a Bloom filter must never report false negatives")
    val one = new StreamingBloom(p = 14, k = 4)
    one.processBatch(spark.createDataset(keys).toDF("key"))
    assert(one.cardinality == sb.cardinality,
      "batched OR-fold must equal the one-shot bitmap")
    val before = sb.cardinality
    sb.processBatch(spark.createDataset(keys.take(500)).toDF("key"))
    assert(sb.cardinality == before,
      "replayed batch changed the bitmap — OR-merge must be idempotent")
  }

  test("false-positive rate stays in the designed regime") {
    val sb = new StreamingBloom(p = 16, k = 4) // m=65536, n=2000 -> fpp ~ 1e-4
    val keys = (1L to 2000L).map(graft.functions.HllAggregate.mix64)
    sb.processBatch(spark.createDataset(keys).toDF("key"))
    val probes = (1_000_001L to 1_020_000L).map(graft.functions.HllAggregate.mix64)
    val fp = probes.count(sb.mightContain)
    assert(fp <= 40, s"$fp false positives in 20k probes (expected ~2)")
    assert(sb.fppMicro <= 2000, s"estimated fpp ${sb.fppMicro}e-6 off-regime")
  }

  test("shard merge ORs bitmaps; parameter mismatch refuses") {
    val a = new StreamingBloom(12, 3)
    val b = new StreamingBloom(12, 3)
    a.processBatch(spark.createDataset((1L to 300L).toSeq).toDF("key"))
    b.processBatch(spark.createDataset((301L to 600L).toSeq).toDF("key"))
    a.merge(b)
    assert((1L to 600L).forall(a.mightContain))
    val c = new StreamingBloom(13, 3)
    val e = intercept[IllegalArgumentException](a.merge(c))
    assert(e.getMessage.contains("mismatch"))
  }

  test("persist/restore round-trips the bitmap; (p,k) mismatch fails fast") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_sbloom")
    try {
      val sb = new StreamingBloom(12, 3)
      val keys = (1L to 400L).map(_ * 2654435761L)
      sb.processBatch(spark.createDataset(keys).toDF("key"))
      sb.saveTo(cache, "bloom_state")
      val back = StreamingBloom.restore(cache, "bloom_state", 12, 3)
      assert(back.cardinality == sb.cardinality)
      assert(keys.forall(back.mightContain))
      // absent table -> fresh empty bitmap
      val fresh = StreamingBloom.restore(cache, "bloom_missing", 12, 3)
      assert(fresh.cardinality == 0)
      // different parameters on resume must refuse, not corrupt
      val e = intercept[IllegalArgumentException] {
        StreamingBloom.restore(cache, "bloom_state", 14, 3)
      }
      assert(e.getMessage.contains("cannot resume"))
      val e2 = intercept[IllegalArgumentException] {
        StreamingBloom.restore(cache, "bloom_state", 12, 4)
      }
      assert(e2.getMessage.contains("cannot resume"))
    } finally cache.dropAll()
  }

  test("filterSeen screens map-side: unseen-drop is exact, seen-keep is a superset") {
    val sb = new StreamingBloom(p = 16, k = 3)
    val seen = (1L to 3000L).map(_ * 2654435761L)
    sb.processBatch(spark.createDataset(seen).toDF("key"))
    val fresh = (1L to 2000L).map(_ * 40503L + 7L).filterNot(seen.toSet)
    val batch = spark.createDataset(seen.take(500) ++ fresh).toDF("key")
    // keepSeen=false: every truly-seen key MUST be gone (no false
    // negatives), survivors are a subset of the fresh keys
    val unseen = sb.filterSeen(batch, keepSeen = false)
      .collect().map(_.getLong(0)).toSet
    assert(unseen.intersect(seen.toSet).isEmpty,
      "a seen key survived the unseen-only screen")
    assert(unseen.subsetOf(fresh.toSet))
    // keepSeen=true: ALL seen keys kept; extras only at the fpp rate
    val kept = sb.filterSeen(batch, keepSeen = true)
      .collect().map(_.getLong(0)).toSet
    assert(seen.take(500).forall(kept),
      "a seen key was dropped by the seen-only screen")
    // the two screens partition the batch
    assert(kept.size + unseen.size == batch.count())
    // snapshot semantics: later folds don't change an already-built frame
    val frame = sb.filterSeen(batch, keepSeen = false)
    val before = frame.count()
    sb.processBatch(spark.createDataset(fresh.take(100)).toDF("key"))
    assert(frame.count() == before,
      "filterSeen must snapshot the bitmap at call time")
  }
}
