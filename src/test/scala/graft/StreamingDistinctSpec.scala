package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.HllAggregate
import graft.streaming.StreamingDistinct

/** Cross-batch HLL distinct: batch merges equal one-shot registers,
  * replays don't inflate, state persists/restores with a p guard. */
class StreamingDistinctSpec extends SparkTestBase {

  import spark.implicits._

  private def oneShotRegs(keys: Seq[Long], p: Int): Array[Byte] = {
    val regs = new Array[Byte](1 << p)
    keys.distinct.foreach { k =>
      val h = HllAggregate.mix64(k)
      val j = (h >>> (64 - p)).toInt
      val rho = HllAggregate.rho(h, p)
      if (rho > regs(j)) regs(j) = rho.toByte
    }
    regs
  }

  test("batch merges equal one-shot registers; replays are idempotent") {
    val p = 10
    val keys = (1L to 3000L).map(_ * 17L)
    val sd = new StreamingDistinct(p)
    keys.grouped(700).foreach { b =>
      sd.processBatch(spark.createDataset(b).toDF("key"))
    }
    assert(java.util.Arrays.equals(sd.registers, oneShotRegs(keys, p)))
    // re-deliver the first batch (at-least-once source): no change
    val before = sd.registers
    sd.processBatch(spark.createDataset(keys.take(700)).toDF("key"))
    assert(java.util.Arrays.equals(sd.registers, before),
      "replayed batch changed the summary — max-merge must be idempotent")
  }

  test("estimate lands within the expected HLL error regime") {
    val p = 10
    val n = 20000
    val sd = new StreamingDistinct(p)
    val keys = (1 to n).map(i => HllAggregate.mix64(i.toLong)) // spread keys
    keys.grouped(5000).foreach { b =>
      sd.processBatch(spark.createDataset(b).toDF("key"))
    }
    val est = sd.estimate
    // raw HLL at n/m ~ 20: ±1.04/sqrt(1024) ~ 3.3% std error; allow 5x
    assert(math.abs(est - n) <= n * 0.17, s"estimate $est too far from $n")
  }

  test("persist/restore round-trips registers; p mismatch fails fast") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_sdist")
    try {
      val sd = new StreamingDistinct(8)
      sd.processBatch(spark.createDataset((1L to 500L).toSeq).toDF("key"))
      sd.saveTo(cache, "sdist_state")
      val back = StreamingDistinct.restore(cache, "sdist_state", 8)
      assert(java.util.Arrays.equals(back.registers, sd.registers))
      assert(back.estimate == sd.estimate)
      // absent table -> fresh
      val fresh = StreamingDistinct.restore(cache, "sdist_missing", 8)
      assert(fresh.zeroRegisters == 256)
      // different p on resume must refuse, not corrupt
      val e = intercept[IllegalArgumentException] {
        StreamingDistinct.restore(cache, "sdist_state", 10)
      }
      assert(e.getMessage.contains("registers"))
    } finally cache.dropAll()
  }

  test("foreachBatch harness: registers accumulate over a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L to 800L: _*)
    val sd = new StreamingDistinct(10)
    val q = input.toDF().toDF("key").writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sd.processBatch(batch))
      .start()
    try {
      q.processAllAvailable()
      input.addData(401L to 1200L: _*) // half-overlapping second batch
      q.processAllAvailable()
    } finally q.stop()
    assert(java.util.Arrays.equals(sd.registers,
      oneShotRegs((1L to 1200L).toSeq, 10)))
  }
}
