package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingHeavyHitters

/** Cross-batch Misra–Gries summary: the MG bound survives the merge,
  * estimates never overcount, state persists/restores. */
class StreamingHeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  /** Skewed synthetic stream: token "h<i>" appears heavyCount/(i+1)
    * times; a long unique tail pads N. Deterministic interleave. */
  private def stream(heavy: Int, heavyCount: Int, tail: Int): Seq[String] = {
    val hs = (0 until heavy).flatMap(i =>
      Seq.fill(heavyCount / (i + 1))(s"h$i"))
    val ts = (0 until tail).map(i => s"t$i")
    // deterministic shuffle (fixed seed) so no ordering accident hides
    // a bug — MG's guarantee is order-independent
    new scala.util.Random(7).shuffle(hs ++ ts)
  }

  private def trueCounts(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("MG bound holds across batches: presence + bounded undercount") {
    val k = 20
    val data = stream(heavy = 5, heavyCount = 600, tail = 1500)
    val hh = new StreamingHeavyHitters(k)
    data.grouped(800).foreach { b =>
      hh.processBatch(spark.createDataset(b).toDF("token"))
    }
    val truth = trueCounts(data)
    val n = data.size.toLong
    assert(hh.n == n)
    val bound = n / (k + 1) + 1
    // every token comfortably above the resolution is present
    truth.filter(_._2 > 2L * bound).keys.foreach { t =>
      assert(hh.snapshot.contains(t), s"heavy token $t missing")
    }
    // estimates never overcount, and undercount stays within the bound
    hh.snapshot.foreach { case (t, est) =>
      val tc = truth.getOrElse(t, 0L)
      assert(est <= tc, s"$t overcounted: $est > $tc")
      assert(tc - est <= bound, s"$t undercounted past the bound: $tc - $est > $bound")
    }
  }

  test("batch slicing does not change the clearly-heavy verdicts") {
    val k = 10
    val data = stream(heavy = 3, heavyCount = 900, tail = 900)
    def run(batches: Seq[Seq[String]]): Set[String] = {
      val hh = new StreamingHeavyHitters(k)
      batches.foreach(b => hh.processBatch(spark.createDataset(b).toDF("token")))
      hh.heavyHitters(denom = 5).map(_._1).toSet
    }
    val oneShot = run(Seq(data))
    val sliced = run(data.grouped(500).toSeq)
    val truth = trueCounts(data)
    val n = data.size.toLong
    // tokens at ≥ 2N/5 must be reported by BOTH runs; the estimate
    // threshold can only drop borderline ones, never the clear ones
    val clear = truth.filter(_._2 * 5 >= 2L * n).keys.toSet
    assert(clear.subsetOf(oneShot) && clear.subsetOf(sliced),
      s"clear heavy hitters lost: $clear vs $oneShot / $sliced")
    // and nothing reported is actually light (estimates undercount)
    (oneShot ++ sliced).foreach { t =>
      assert(truth(t) * 5 > n, s"$t reported but light: ${truth(t)} * 5 <= $n")
    }
  }

  test("persist/restore round-trips the summary and N") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_shh")
    try {
      val hh = new StreamingHeavyHitters(8)
      hh.processBatch(spark.createDataset(
        Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map(i => s"u$i"))
        .toDF("token"))
      hh.saveTo(cache, "shh_state")
      val back = StreamingHeavyHitters.restore(cache, "shh_state", 8)
      assert(back.n == hh.n && back.snapshot == hh.snapshot)
      // absent table -> fresh
      val fresh = StreamingHeavyHitters.restore(cache, "shh_missing", 8)
      assert(fresh.n == 0L && fresh.snapshot.isEmpty)
    } finally cache.dropAll()
  }

  test("foreachBatch harness: summary accumulates over a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    input.addData(Seq.fill(40)("x") ++ (1 to 30).map(i => s"a$i"): _*)
    val hh = new StreamingHeavyHitters(10)
    val q = input.toDF().toDF("token").writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
        hh.processBatch(batch))
      .start()
    try {
      q.processAllAvailable()
      input.addData(Seq.fill(25)("x") ++ (31 to 55).map(i => s"a$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(hh.n == 120L)
    val top = hh.heavyHitters(denom = 4)
    assert(top.map(_._1) == Seq("x"), s"expected x as the sole hitter: $top")
    assert(top.head._2 <= 65L && top.head._2 >= 65L - 120L / 11 - 1)
  }
}
