package graft

import org.apache.spark.sql.functions._

import graft.functions.GramAggregate

/**
 * Pins the single-pass Gram-matrix aggregate to brute-force sums and
 * checks the merge path (partition-count invariance) and the skip rules
 * for null / wrong-dimension vectors.
 */
class GramAggregateSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 5
  private val triLen = d * (d + 1) / 2

  private def mkVecs(seed: Int, n: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(d)(rnd.nextFloat() * 2f - 1f))
  }

  private def brute(vs: Seq[Seq[Float]]): Array[Double] = {
    val out = new Array[Double](triLen + d + 1)
    vs.foreach { v =>
      var k = 0
      for (i <- 0 until d) {
        for (j <- i until d) { out(k) += v(i).toDouble * v(j).toDouble; k += 1 }
        out(triLen + i) += v(i).toDouble
      }
      out(triLen + d) += 1.0
    }
    out
  }

  test("gram equals brute-force sums (exact products, ulp-level sum tolerance)") {
    val vs = mkVecs(seed = 1, n = 200)
    val got = vs.toDF("embedding")
      .agg(GramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Double]].head()
    val want = brute(vs)
    assert(got.length == want.length)
    got.indices.foreach { k =>
      assert(math.abs(got(k) - want(k)) <= 1e-9 * (1 + math.abs(want(k))),
        s"component $k: ${got(k)} vs ${want(k)}")
    }
  }

  test("result is partition-count invariant (merge path) up to summation ulp") {
    val vs = mkVecs(seed = 2, n = 500)
    def run(parts: Int): Seq[Double] = vs.toDF("embedding")
      .repartition(parts)
      .agg(GramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Double]].head()
    val a = run(1)
    val b = run(7)
    a.indices.foreach { k =>
      assert(math.abs(a(k) - b(k)) <= 1e-9 * (1 + math.abs(a(k))))
    }
    // n is integer-exact regardless of partitioning
    assert(a(triLen + d) == 500.0 && b(triLen + d) == 500.0)
  }

  test("null and wrong-dimension vectors are skipped, not poisoned") {
    val good = mkVecs(seed = 3, n = 10)
    val rows: Seq[Option[Seq[Float]]] =
      good.map(Some(_)) ++ Seq(None, Some(Seq(1f, 2f)), Some(Seq.empty[Float]))
    val got = rows.toDF("embedding")
      .agg(GramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Double]].head()
    val want = brute(good)
    assert(got(triLen + d) == 10.0)
    got.indices.foreach { k =>
      assert(math.abs(got(k) - want(k)) <= 1e-9 * (1 + math.abs(want(k))))
    }
  }
}
