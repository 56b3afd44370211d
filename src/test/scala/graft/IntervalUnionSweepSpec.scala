package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.SuffixQueries

/**
 * Property gate for q224's interval-union sweep
 * (`SuffixQueries.intervalUnionCovered`): the running-max-end window
 * trick must equal a brute-force position-marking union on RANDOM
 * interval sets — nested spans, adjacent spans, ties, and
 * doc-boundary singletons included, which the tiny oracle corpus may
 * never exercise. Deterministic seeds so failures reproduce.
 */
class IntervalUnionSweepSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(spans: Seq[(Long, Long, Long)]): Map[Long, Long] =
    spans.groupBy(_._1).map { case (d, ss) =>
      d -> ss.flatMap { case (_, p, m) => p until (p + m) }.distinct.size.toLong
    }

  private def viaSweep(spans: Seq[(Long, Long, Long)]): Map[Long, Long] =
    SuffixQueries.intervalUnionCovered(
        spans.toDF("d", "p", "m").repartition(5))
      .as[(Long, Long)].collect().toMap

  private val spanSet: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    spans <- Gen.listOfN(n, for {
      d <- Gen.choose(0L, 3L)       // few docs → dense overlap pressure
      p <- Gen.choose(0L, 40L)      // small range → nesting + adjacency
      m <- Gen.choose(1L, 12L)
    } yield (d, p, m))
  } yield spans

  test("sweep equals brute-force union on random interval sets") {
    (0 until 40).foreach { i =>
      val raw = spanSet.pureApply(Gen.Parameters.default, Seed(i.toLong))
      // q224's contract: one span per (d, p) — keep the longest
      val spans = raw.groupBy(s => (s._1, s._2))
        .map { case ((d, p), ss) => (d, p, ss.map(_._3).max) }.toSeq
      assert(viaSweep(spans) == bruteForce(spans), s"seed $i: $spans")
    }
  }

  test("edge shapes: nested, chained-adjacent, identical, disjoint") {
    // fully nested: [0,10) ⊃ [2,5) ⊃ [3,4)
    assert(viaSweep(Seq((1L, 0L, 10L), (1L, 2L, 3L), (1L, 3L, 1L))) ==
      Map(1L -> 10L))
    // chain of exactly-adjacent spans: [0,3)+[3,6)+[6,9)
    assert(viaSweep(Seq((1L, 0L, 3L), (1L, 3L, 3L), (1L, 6L, 3L))) ==
      Map(1L -> 9L))
    // one-position overlap: [0,5) ∪ [4,9) = 9
    assert(viaSweep(Seq((1L, 0L, 5L), (1L, 4L, 5L))) == Map(1L -> 9L))
    // disjoint + a second doc
    assert(viaSweep(Seq((1L, 0L, 2L), (1L, 10L, 2L), (2L, 7L, 1L))) ==
      Map(1L -> 4L, 2L -> 1L))
  }

  test("tie starts (same d,p from both neighbor directions) stay exact") {
    // the raw union feeding q224 can present duplicate starts before
    // its max(m) aggregation; union length is order-independent
    val ties = Seq((1L, 5L, 3L), (1L, 5L, 8L), (1L, 5L, 1L))
    assert(viaSweep(ties) == Map(1L -> 8L))
  }
}
