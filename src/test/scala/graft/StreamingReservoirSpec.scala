package graft

import graft.functions.HllAggregate
import graft.streaming.StreamingReservoir

/** Cross-batch bottom-k sample: batched fold equals one-shot, replays
  * and shard merges are idempotent, the distinct estimate lands in its
  * error regime, state persists/restores with a k guard. */
class StreamingReservoirSpec extends SparkTestBase {

  import spark.implicits._

  private def oneShot(keys: Seq[Long], k: Int): Seq[(Long, Long)] =
    keys.distinct
      .map(key => (HllAggregate.mix64(key) ^ Long.MinValue, key))
      .sortBy(_._1).take(k)

  test("batched fold equals one-shot bottom-k; replay is idempotent") {
    val k = 64
    val keys = (1L to 5000L).map(_ * 31L)
    val sr = new StreamingReservoir(k)
    keys.grouped(1100).foreach { b =>
      sr.processBatch(spark.createDataset(b).toDF("key"))
    }
    assert(sr.sample == oneShot(keys, k))
    val before = sr.sample
    sr.processBatch(spark.createDataset(keys.take(1100)).toDF("key"))
    assert(sr.sample == before,
      "replayed batch changed the sample — priorities are key-determined")
  }

  test("shard merge unions and re-truncates; k mismatch refuses") {
    val a = new StreamingReservoir(32)
    val b = new StreamingReservoir(32)
    a.processBatch(spark.createDataset((1L to 800L).toSeq).toDF("key"))
    b.processBatch(spark.createDataset((401L to 1200L).toSeq).toDF("key"))
    a.merge(b)
    assert(a.sample == oneShot((1L to 1200L).toSeq, 32),
      "merged sketch must equal the one-shot sketch over the union")
    val e = intercept[IllegalArgumentException](a.merge(new StreamingReservoir(16)))
    assert(e.getMessage.contains("mismatch"))
  }

  test("distinct estimate: exact under k, within the bottom-k regime over") {
    val sr = new StreamingReservoir(256)
    sr.processBatch(spark.createDataset((1L to 100L).toSeq).toDF("key"))
    assert(sr.distinctEstimate == 100L, "under-full sketch counts exactly")
    val n = 50000
    sr.processBatch(spark.createDataset((1L to n.toLong).toSeq).toDF("key"))
    val est = sr.distinctEstimate
    // bottom-k std error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - n) <= n / 4, s"estimate $est too far from $n")
  }

  test("persist/restore round-trips the sample; k mismatch fails fast") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_srsv")
    try {
      val sr = new StreamingReservoir(16)
      sr.processBatch(spark.createDataset((1L to 300L).toSeq).toDF("key"))
      sr.saveTo(cache, "rsv_state")
      val back = StreamingReservoir.restore(cache, "rsv_state", 16)
      assert(back.sample == sr.sample)
      assert(back.distinctEstimate == sr.distinctEstimate)
      val fresh = StreamingReservoir.restore(cache, "rsv_missing", 16)
      assert(fresh.size == 0)
      val e = intercept[IllegalArgumentException] {
        StreamingReservoir.restore(cache, "rsv_state", 32)
      }
      assert(e.getMessage.contains("cannot resume"))
    } finally cache.dropAll()
  }
}
