package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StatsQueries.sampleModulus

/**
 * Pins the absolute-size decimation contract behind q248's pair-
 * completeness anchor and q232's probe set: `key % m == 0` with
 * m = sampleModulus(n, target) yields a sample of FEWER than 2·target
 * rows at ANY table size (and the whole table when n ≤ target), so a
 * brute-force truth anchor built on it has constant cost at 100× the
 * corpus — unlike the round-13 fixed-fraction `% 20`, whose broadcast
 * side grew linearly and whose pair comparisons grew quadratically
 * with N. The formula is max(1, n div target), truncation-identical
 * to the oracle's `greatest(1, COUNT(*) // target)`.
 */
class SampleModulusSpec extends AnyFunSuite {

  private val targets = Seq(100L, 1000L, 2000L, 10000L)
  private val sizes = Seq(0L, 1L, 99L, 100L, 101L, 1999L, 2000L, 2001L,
    3999L, 4000L, 5999L, 20000L, 999999L, 1000000L, 123456789L,
    999999999999L) ++ (1L to 50L).map(_ * 777L)

  test("sample size stays under 2x target at any table size") {
    for (t <- targets; n <- sizes) {
      val m = sampleModulus(n, t)
      assert(m >= 1L)
      val sample = n / m // multiples of m among n dense keys, within 1
      assert(sample < 2 * t,
        s"n=$n target=$t m=$m sample=$sample breaches 2x bound")
    }
  }

  test("small tables sample whole (m = 1) and big tables keep >= target/2") {
    for (t <- targets; n <- sizes) {
      val m = sampleModulus(n, t)
      if (n <= t) assert(m == 1L, s"n=$n target=$t expected m=1, got $m")
      else assert(n / m >= t / 2, s"n=$n target=$t m=$m sample too small")
    }
  }

  test("matches the oracle's greatest(1, n // target) exactly") {
    for (t <- targets; n <- sizes)
      assert(sampleModulus(n, t) == math.max(1L, n / t))
  }
}
