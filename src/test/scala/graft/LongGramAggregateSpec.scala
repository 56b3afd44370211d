package graft

import org.apache.spark.sql.functions._

import graft.functions.LongGramAggregate

/**
 * Pins the exact-integer Gram aggregate (q242's foundation) to
 * brute-force BigInt sums: unlike the double variant, equality here is
 * EXACT — any partitioning must produce the identical long buffer, or
 * the downstream power iteration would diverge between engines.
 */
class LongGramAggregateSpec extends SparkTestBase {
  import spark.implicits._

  private val d = 6
  private val triLen = d * (d + 1) / 2

  private def mkVecs(seed: Int, n: Int): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(d)(rnd.nextInt(8001).toLong - 4000L))
  }

  private def brute(vs: Seq[Seq[Long]]): Array[Long] = {
    val out = new Array[Long](triLen + d + 1)
    vs.foreach { v =>
      var k = 0
      for (i <- 0 until d) {
        for (j <- i until d) { out(k) += v(i) * v(j); k += 1 }
        out(triLen + i) += v(i)
      }
      out(triLen + d) += 1L
    }
    out
  }

  test("long gram equals brute-force sums EXACTLY, at any partitioning") {
    val vs = mkVecs(seed = 11, n = 400)
    val want = brute(vs).toSeq
    Seq(1, 7, 32).foreach { parts =>
      val got = vs.toDF("embedding")
        .repartition(parts)
        .agg(LongGramAggregate.gram(col("embedding"), d).as("g"))
        .as[Seq[Long]].head()
      assert(got == want, s"parts=$parts")
    }
  }

  test("null and wrong-dimension vectors are skipped, not poisoned") {
    val good = mkVecs(seed = 12, n = 10)
    val rows: Seq[Option[Seq[Long]]] =
      good.map(Some(_)) ++ Seq(None, Some(Seq(1L, 2L)), Some(Seq.empty[Long]))
    val got = rows.toDF("embedding")
      .agg(LongGramAggregate.gram(col("embedding"), d).as("g"))
      .as[Seq[Long]].head()
    assert(got == brute(good).toSeq)
    assert(got(triLen + d) == 10L)
  }
}
