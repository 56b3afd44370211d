package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingEmbeddingDrift

/**
 * Streaming embedding-space drift: the first batch freezes a reference
 * Gram; later folds report the cosine between the reference's and the
 * cumulative Gram's dominant eigenvectors. Same-distribution batches
 * must stay near cosine 1; a rotated dominant direction must drop it.
 * Shard merge must equal single-monitor folding EXACTLY (BigInt Gram
 * addition), and persist/restore must round-trip both buffers plus the
 * dimension.
 */
class StreamingEmbeddingDriftSpec extends SparkTestBase {

  import spark.implicits._

  private val d = 8

  /** Anisotropic cloud with dominant direction `axis`. */
  private def cloud(seed: Int, n: Int, axis: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val a = rnd.nextGaussian() * 4.0
      (0 until d).map { i =>
        ((if (i == axis) a else 0.0) + rnd.nextGaussian() * 0.2).toFloat
      }
    }
  }

  test("same distribution stays near cosine 1; a rotated axis drops it") {
    val m = new StreamingEmbeddingDrift("embedding", d)
    assert(m.report().isEmpty && !m.isFrozen)
    m.processBatch(cloud(seed = 1, n = 400, axis = 2).toDF("embedding"))
    assert(m.isFrozen && m.referenceN == 400)
    val same = m.report().get
    assert(math.abs(same.cosine) > 0.999) // cumulative == reference here

    m.processBatch(cloud(seed = 2, n = 400, axis = 2).toDF("embedding"))
    val still = m.report().get
    assert(math.abs(still.cosine) > 0.99, s"same-axis drift ${still.cosine}")
    assert(still.nCur == 800 && still.nRef == 400)

    // flood with a rotated dominant axis: the cumulative top component
    // moves away from the frozen reference's
    m.processBatch(cloud(seed = 3, n = 3000, axis = 6).toDF("embedding"))
    val moved = m.report().get
    assert(math.abs(moved.cosine) < 0.7, s"rotated axis kept ${moved.cosine}")
  }

  test("an empty first batch does not freeze the reference") {
    val m = new StreamingEmbeddingDrift("embedding", d)
    m.processBatch(cloud(seed = 9, n = 0, axis = 3).toDF("embedding"))
    // no rows yet: unfrozen, no report — a zero reference would have
    // pinned every later cosine to 0.0 (= maximal drift) permanently
    assert(!m.isFrozen && m.report().isEmpty && m.n == 0L)
    m.processBatch(cloud(seed = 10, n = 400, axis = 3).toDF("embedding"))
    assert(m.isFrozen && m.referenceN == 400L && m.n == 400L)
    assert(math.abs(m.report().get.cosine) > 0.999)
  }

  test("shard merge equals single-monitor folding exactly") {
    val b1 = cloud(seed = 4, n = 300, axis = 1)
    val b2 = cloud(seed = 5, n = 300, axis = 1)
    val whole = new StreamingEmbeddingDrift("embedding", d)
    whole.processBatch(b1.toDF("embedding"))
    whole.processBatch(b2.toDF("embedding"))
    val s1 = new StreamingEmbeddingDrift("embedding", d)
    val s2 = new StreamingEmbeddingDrift("embedding", d)
    s1.processBatch(b1.toDF("embedding"))
    s2.processBatch(b2.toDF("embedding"))
    s1.merge(s2)
    assert(s1.report().get == whole.report().get)
    val bad = new StreamingEmbeddingDrift("embedding", d + 1)
    intercept[IllegalArgumentException](s1.merge(bad))
  }

  test("persist/restore round-trips both Gram buffers and the dimension") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_sedrift")
    try {
      val m = new StreamingEmbeddingDrift("embedding", d)
      m.processBatch(cloud(seed = 6, n = 200, axis = 0).toDF("embedding"))
      m.processBatch(cloud(seed = 7, n = 200, axis = 0).toDF("embedding"))
      m.saveTo(cache, "sed_state")
      val back = StreamingEmbeddingDrift.restore(cache, "sed_state", "embedding")
      assert(back.d == d && back.n == 400L && back.referenceN == 200L)
      assert(back.report().get == m.report().get)
      val fresh = StreamingEmbeddingDrift.restore(cache, "sed_missing",
        "embedding", defaultD = 16)
      assert(fresh.d == 16 && fresh.n == 0L && fresh.report().isEmpty)

      // Gram entries past BIGINT (a ~10⁹-batch stream) must round-trip
      // exactly — the default BigDecimal encoder is (38,18) and would
      // overflow these to null if values rode it instead of strings
      val dim = 2
      val bufLen = dim * (dim + 1) / 2 + dim + 1
      val big = Array.tabulate(bufLen)(i =>
        BigInt("123456789012345678901234567") * (i + 1) *
          (if (i % 2 == 0) 1 else -1))
      val huge = new StreamingEmbeddingDrift("embedding", dim)
      huge.setStateForTest(Some(big.clone()), Some(big.map(_ * 3)))
      huge.saveTo(cache, "sed_huge")
      val hback = StreamingEmbeddingDrift.restore(cache, "sed_huge", "embedding")
      assert(hback.d == dim)
      assert(hback.stateForTest ==
        ((Some(big.toSeq), Some(big.map(_ * 3).toSeq))))
    } finally cache.dropAll()
  }

  test("foreachBatch harness folds a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Seq[Float]]
    input.addData(cloud(seed = 8, n = 150, axis = 3): _*)
    val m = new StreamingEmbeddingDrift("embedding", d)
    val q = m.start(input.toDF().toDF("embedding"), _ => ())
    try {
      q.processAllAvailable()
      assert(m.n == 150L && m.isFrozen)
    } finally q.stop()
  }
}
