package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.names.NameNormalizer

/**
 * Golden cases mirror the reference's normalizer contract
 * (`tests/unit_tests/test_text_normalization.py:190-239`).
 */
class NameNormalizerSpec extends AnyFunSuite {

  /** Seeded pseudo-random strings for property-style checks. */
  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      val len = rnd.nextInt(30)
      new String(Array.fill(len)((rnd.nextInt(94) + 33).toChar))
    }
  }

  val golden: Seq[(String, String)] = Seq(
    "ExampleName" -> "examplename",
    "Example Name" -> "example_name",
    "Example-Name" -> "example_name",
    "example_name" -> "example_name",
    "EXAMPLE_NAME" -> "example_name",
    "123ExampleName" -> "_123examplename",
    "1" -> "_1",
    "2" -> "_2",
    "3" -> "_3",
    "病院" -> "__",                    // non-ASCII → underscores (valid: has none alnum? see below)
    "camelCase" -> "camelcase",
    "snake_case" -> "snake_case",
    "kebab-case" -> "kebab_case",
    "PascalCase" -> "pascalcase",
    "a b c" -> "a_b_c",
    " leading" -> "leading",
    "trailing " -> "trailing",
    "special!@#chars" -> "special___chars",
    "UPPER" -> "upper")

  test("golden normalization cases") {
    golden.foreach {
      case (in, _) if in == "病院" => () // handled in error cases below
      case (in, out) =>
        assert(NameNormalizer.normalize(in) == out, s"input: '$in'")
    }
  }

  test("names that normalize to nothing raise") {
    Seq("", "   ", "!", "!@$", "(())", "病院").foreach { bad =>
      assertThrows[NameNormalizer.InvalidNameException](
        NameNormalizer.normalize(bad))
    }
  }

  test("postgres variant truncates to 63 chars") {
    val long = "a" * 100
    assert(NameNormalizer.normalizeTruncated(long).length == 63)
    assert(NameNormalizer.normalizeTruncated("Short Name") == "short_name")
  }

  test("normalization is idempotent (property)") {
    randomStrings(500).foreach { s =>
      NameNormalizer.normalizeOpt(s).foreach { n =>
        assert(NameNormalizer.normalize(n) == n, s"input: '$s'")
      }
    }
  }

  test("output alphabet is [a-z0-9_] and never starts with a digit (property)") {
    randomStrings(500).foreach { s =>
      NameNormalizer.normalizeOpt(s).foreach { n =>
        assert(n.forall(c => c == '_' || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        assert(!n.head.isDigit)
      }
    }
  }
}
