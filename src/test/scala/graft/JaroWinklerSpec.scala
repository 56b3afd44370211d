package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.{JaroWinklerExpression, StringSimilarityFunctions}

/** Compiled Jaro-Winkler kernel (q158): textbook values, the DuckDB
  * parity traps (floored half-transpositions, 0.7 boost threshold,
  * both-empty = 0), and algebraic invariants under fuzz. */
class JaroWinklerSpec extends SparkTestBase with TableDrivenPropertyChecks {

  private def jw(a: String, b: String): Double =
    JaroWinklerExpression.similarity(a, b)

  test("textbook values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("abcd", "abdc") - 0.9333333333333333) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
  }

  test("DuckDB parity traps") {
    // window clamp: adjacent swap outside window → no matches
    assert(jw("ab", "ba") == 0.0)
    // boost threshold: jaro 0.5 with common prefix stays unboosted
    assert(jw("abcdefgh", "abxxxxxx") == 0.5)
    // both-empty is 0.0 (DuckDB convention, not the 1.0 some libs use)
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    // floored half-transpositions: 'mcpiq' vs 'ghqyacicem' has an odd
    // raw transposition count; fractional halving gives 0.4667,
    // DuckDB (and the Winkler reference) give 0.5222
    assert(math.abs(jw("mcpiq", "ghqyacicem") - 0.5222222222222221) < 1e-15)
  }

  test("invariants under fuzz: symmetry, range, identity") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: $a/$b -> $s")
      assert(s == jw(b, a), s"symmetry: $a/$b")
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  test("expression evaluates inside a Spark plan with null semantics") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("abc", null))
      .toDF("a", "b")
      .select(StringSimilarityFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(rows(1).isNullAt(0))
  }
}
