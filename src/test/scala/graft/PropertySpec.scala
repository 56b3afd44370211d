package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.names.NameNormalizer

/**
 * Property-based invariants (beyond the reference's test approach —
 * SURVEY §5 notes it has no property testing despite normalizer-shaped
 * candidates). Pure functions only: fast, no SparkSession. Deterministic
 * seeds so failures reproduce.
 */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val weird: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '-', '.', '!', 'É', 'ß', '字', '0', '9', '_')))
    .map(_.mkString)

  test("normalize is idempotent and yields valid snake_case identifiers") {
    samples(weird).foreach { s =>
      NameNormalizer.normalizeOpt(s).foreach { n =>
        assert(NameNormalizer.normalize(n) == n, s"not idempotent for: $s")
        assert(n.matches("[a-z0-9_]+"), s"bad charset for: $s -> $n")
        assert(!n.head.isDigit, s"leading digit for: $s -> $n")
      }
    }
  }

  test("word shingles: count and width invariants") {
    val words = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta")))
    samples(words).foreach { ws =>
      val text = ws.mkString(" ")
      val sh = graft.functions.TextHash.shingles(text, 3)
      if (ws.nonEmpty) assert(sh.length == math.max(ws.length - 2, 0))
      sh.foreach(s => assert(s.split(" ").length == 3))
    }
  }

  test("md5hex matches JDK MessageDigest for arbitrary strings") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val jdk = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(graft.functions.TextHash.md5hex(s) == jdk)
    }
  }
}
