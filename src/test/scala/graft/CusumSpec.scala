package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventAnalytics.cusumTrajectory

/** q210's recursion, pinned on hand-built series: the driver data is
  * stationary enough that sf0.1 never alarms, so a flipped comparison
  * or a dropped slack term would stay invisible to the oracle gate —
  * these cases make the alarm semantics load-bearing. */
class CusumSpec extends AnyFunSuite {

  private val Ref = 100L * 1000000L // level 100 in micros

  test("stationary series inside the slack band never accumulates") {
    // ±5 around 100 stays within slack (ref/20 = 5 in level units)
    val ys = Seq[Long](100, 105, 95, 100, 104, 96, 100)
    val t = cusumTrajectory(ys, Ref)
    assert(t.forall { case (sp, sn, a) => sp == 0L && sn == 0L && !a })
  }

  test("upward level shift crosses h = ref/4 and alarms on S+") {
    // +15/day past slack 5 accumulates 10e6/day; h = 25e6 -> first alarm
    // on the fourth day (cumulated 30e6)
    val ys = Seq[Long](100, 115, 115, 115, 115)
    val t = cusumTrajectory(ys, Ref)
    assert(t.map(_._3) == Seq(false, false, false, true, true))
    assert(t.last._1 == 40L * 1000000L && t.last._2 == 0L)
  }

  test("downward shift alarms on S-; recovery drains the statistic") {
    val ys = Seq[Long](100, 85, 85, 85, 85, 104, 104, 104, 100)
    val t = cusumTrajectory(ys, Ref)
    assert(t(3)._3 && t(3)._2 == 30L * 1000000L, "S- must cross h on day 4")
    // +104 days drain 9e6/day (95e6 in, 104e6 out) without charging S+
    assert(!t(6)._3 && t(6)._2 == 22L * 1000000L,
      "recovery must drain S- back below h")
    assert(t.map(_._1).forall(_ == 0L),
      "a rebound inside the slack band never charges S+")
  }

  test("max(0, .) floors both statistics — no negative carry") {
    val ys = Seq[Long](200, 50)
    val t = cusumTrajectory(ys, Ref)
    assert(t(0)._1 > 0 && t(0)._2 == 0)
    assert(t(1)._2 > 0, "a crash after a spike must still charge S-")
  }
}
