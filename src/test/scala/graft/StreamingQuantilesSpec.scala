package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingQuantiles

/**
 * Streaming exact-quantile monitor: quantiles must equal a sequential
 * type-1 (inverse-CDF) reference on the quantized grid, regardless of
 * batch slicing; shard merge must equal single-monitor processing;
 * persist/restore round-trips counts AND the grid scale; grid
 * mismatches fail fast.
 */
class StreamingQuantilesSpec extends SparkTestBase {

  import spark.implicits._

  private val qs = Seq(0.5, 0.9, 0.99)

  /** Sequential reference: same quantization, same type-1 rule. */
  private def refQuantiles(vals: Seq[Double], scale: Int): Map[Double, Double] = {
    val grid = vals.map(v => BigDecimal(v * scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sorted
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * grid.size).toLong)
      q -> grid(target.toInt - 1).toDouble / scale
    }.toMap
  }

  private def collect(m: StreamingQuantiles): Map[(String, Double), (Double, Long)] =
    m.quantiles(qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap

  test("quantiles equal the sequential reference, at any batch slicing") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(500)(rnd.nextDouble() * 40.0)
    val b = Seq.fill(300)(rnd.nextGaussian() * 5.0 + 100.0)
    val all = a.map(("a", _)) ++ b.map(("b", _))
    Seq(1, 3, 7).foreach { slices =>
      val m = new StreamingQuantiles("k", "v", 100)
      all.grouped(math.max(1, all.size / slices)).foreach(g =>
        m.processBatch(g.toDF("k", "v")))
      val got = collect(m)
      val (ra, rb) = (refQuantiles(a, 100), refQuantiles(b, 100))
      qs.foreach { q =>
        assert(got(("a", q)) == ((ra(q), a.size.toLong)), s"slices=$slices a q=$q")
        assert(got(("b", q)) == ((rb(q), b.size.toLong)), s"slices=$slices b q=$q")
      }
    }
  }

  test("shard merge equals single-monitor processing; scale mismatch fails fast") {
    val rnd = new scala.util.Random(11)
    val x = Seq.fill(200)(rnd.nextDouble() * 10.0).map(("x", _))
    val whole = new StreamingQuantiles("k", "v", 100)
    whole.processBatch(x.toDF("k", "v"))
    val s1 = new StreamingQuantiles("k", "v", 100)
    val s2 = new StreamingQuantiles("k", "v", 100)
    s1.processBatch(x.take(120).toDF("k", "v"))
    s2.processBatch(x.drop(120).toDF("k", "v"))
    s1.merge(s2)
    assert(collect(s1) == collect(whole))
    val bad = new StreamingQuantiles("k", "v", 10)
    intercept[IllegalArgumentException](s1.merge(bad))
  }

  test("persist/restore round-trips counts and grid scale; absent table -> fresh") {
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_squant")
    try {
      val m = new StreamingQuantiles("k", "v", 1000)
      m.processBatch(Seq(("a", 1.25), ("a", 2.5), ("a", 2.5)).toDF("k", "v"))
      m.saveTo(cache, "sq_state")
      val back = StreamingQuantiles.restore(cache, "sq_state", "k", "v")
      assert(back.scale == 1000 && back.n == 3L)
      assert(collect(back) == collect(m))
      val fresh = StreamingQuantiles.restore(cache, "sq_missing", "k", "v", 50)
      assert(fresh.scale == 50 && fresh.n == 0L)
      assert(fresh.quantiles(qs).count() == 0L)
    } finally cache.dropAll()
  }

  test("foreachBatch harness: state accumulates over a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    input.addData((1 to 100).map(i => ("s", i.toDouble)): _*)
    val m = new StreamingQuantiles("k", "v", 100)
    val q = m.start(input.toDF().toDF("k", "v"), _ => ())
    try {
      q.processAllAvailable()
      assert(m.n == 100L)
      val got = collect(m)
      assert(got(("s", 0.5))._1 == 50.0 && got(("s", 0.99))._1 == 99.0)
    } finally q.stop()
  }
}
