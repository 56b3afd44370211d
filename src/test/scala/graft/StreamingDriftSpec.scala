package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDrift

/** Streaming PSI drift: the first batch freezes the reference; later
  * batches report per-key PSI against it. Expected values are computed
  * by a sequential reference implementation of the same smoothed,
  * 6-dp-rounded log2 formula. */
class StreamingDriftSpec extends SparkTestBase {

  import spark.implicits._

  private val bins = 10

  /** Sequential PSI: same binning (frozen ref range), smoothing, and
    * rounding as the operator. */
  private def refPsi(ref: Seq[Double], cur: Seq[Double]): Double = {
    val (mn, mx) = (ref.min, ref.max)
    def bin(v: Double): Int =
      if (mx > mn)
        math.min(math.max(math.floor((v - mn) * bins / (mx - mn)).toInt, 0), bins - 1)
      else 0
    def hist(vs: Seq[Double]): Map[Int, Long] =
      vs.groupBy(bin).map { case (b, g) => b -> g.size.toLong }
    val (hr, hc) = (hist(ref), hist(cur))
    val (tr, tc) = (ref.size.toDouble, cur.size.toDouble)
    val addends = (0 until bins).map { b =>
      val p = (hr.getOrElse(b, 0L) + 0.5) / (tr + bins / 2.0)
      val q = (hc.getOrElse(b, 0L) + 0.5) / (tc + bins / 2.0)
      BigDecimal((p - q) * math.log(p / q) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    BigDecimal(addends.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Double)] =
    df.collect().map { case Row(k: String, nr: Long, nc: Long, psi: Double) =>
      k -> (nr, nc, psi)
    }.toMap

  test("first batch freezes the reference; identical batch scores near zero, shifted batch high") {
    val drift = new StreamingDrift("event_type", "value", bins)
    val refA = (1 to 200).map(i => (i * 37 % 100).toDouble)
    val refB = (1 to 100).map(i => (i * 13 % 50).toDouble)
    val b1 = refA.map(("a", _)) ++ refB.map(("b", _))
    assert(drift.processBatch(b1.toDF("event_type", "value")).count() == 0)

    // batch 2: key a unchanged distribution, key b shifted upward ×3
    val curA = (1 to 150).map(i => (i * 53 % 100).toDouble)
    val curB = (1 to 80).map(i => (i * 13 % 50) * 3.0)
    val got = rows(drift.processBatch(
      (curA.map(("a", _)) ++ curB.map(("b", _))).toDF("event_type", "value")))
    assert(got.keySet == Set("a", "b"))
    assert(got("a")._1 == 200 && got("a")._2 == 150)
    assert(got("a")._3 == refPsi(refA, curA))
    assert(got("b")._3 == refPsi(refB, curB))
    assert(got("a")._3 < 0.1, s"same-distribution PSI should be small: ${got("a")._3}")
    assert(got("b")._3 > 0.5, s"shifted-distribution PSI should alarm: ${got("b")._3}")

    // the reference stays frozen: a third batch compares to batch 1,
    // not batch 2
    val got3 = rows(drift.processBatch(
      curB.map(("b", _)).toDF("event_type", "value")))
    assert(got3("b")._3 == refPsi(refB, curB))
    assert(got3("b")._1 == 100, "n_ref must still be batch 1's count")
  }

  test("novelKeys flags categories unseen at reference time") {
    val drift = new StreamingDrift("event_type", "value", bins)
    drift.processBatch(Seq(("a", 1.0), ("a", 2.0)).toDF("event_type", "value"))
    val novel = drift.novelKeys(
      Seq(("a", 3.0), ("z", 9.0)).toDF("event_type", "value"))
      .as[String].collect().toSeq
    assert(novel == Seq("z"))
  }

  test("foreachBatch harness: PSI rows flow per micro-batch after the reference freezes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    input.addData((1 to 100).map(i => ("a", (i % 10).toDouble)): _*)
    val drift = new StreamingDrift("event_type", "value", bins)
    val seen = mutable.ArrayBuffer.empty[(String, Double)]
    val q = drift.start(
      input.toDF().toDF("event_type", "value"),
      batch => seen.synchronized {
        seen ++= batch.collect().map(r => (r.getString(0), r.getDouble(3)))
      })
    try {
      q.processAllAvailable()
      assert(seen.isEmpty, "first batch only freezes the reference")
      input.addData((1 to 50).map(i => ("a", (i % 10).toDouble + 5.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._1) == Seq("a") && seen.head._2 > 0.0)
  }

  test("merge fails fast on a bin-count mismatch (StreamingBloom p/k contract)") {
    import spark.implicits._
    val a = new StreamingDrift("event_type", "value", bins = 10)
    val b = new StreamingDrift("event_type", "value", bins = 8)
    a.processBatch(Seq(("x", 1.0), ("x", 2.0)).toDF("event_type", "value"))
    b.processBatch(Seq(("y", 1.0), ("y", 2.0)).toDF("event_type", "value"))
    val e = intercept[IllegalArgumentException](a.merge(b))
    assert(e.getMessage.contains("bin-count mismatch"))
    // same bins still merges key-disjoint shards
    val c = new StreamingDrift("event_type", "value", bins = 10)
    c.processBatch(Seq(("z", 1.0), ("z", 2.0)).toDF("event_type", "value"))
    a.merge(c)
    assert(a.referenceHistogram.get.select("k").distinct().count() == 2)
  }
}
