package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextHashFunctions

/**
 * Pins the round-13 compiled text kernels to their declarative duals
 * on adversarial random texts — the parity the q234/q237 oracles
 * assert only on the synthetic corpus. Edge cases the generator
 * forces: empty text, leading/trailing/double spaces (split keeps
 * empty tokens), vowel-free tokens (syllable floor 1), punctuation
 * runs, single-token texts shorter than the widest n-gram.
 */
class KernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("xyz", "rhythm", "a", "Y.!?", "...", "AEIOU", "bcdfg", ""),
    Gen.stringOfN(5, Gen.oneOf('a', 'b', '.', '!', '?', 'e', 'y', 'Z')))
  private val text = Gen.choose(0, 9)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    .flatMap(t => Gen.oneOf(t, " " + t, t + " ", t.replace(" ", "  ")))

  private def samples(n: Int): Seq[String] =
    (0 until n).map(i => text.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("MultiNgramsExpression equals the declarative slice/concat_ws form") {
    val df = samples(200).toDF("text")
    val toks = split(col("text"), " ")
    def declGrams(n: Int) = {
      val arr = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType)))
      transform(arr, g => struct(lit(n).as("n"), g.as("g")))
    }
    val rows = df.select(
      TextHashFunctions.multiNgrams(col("text"), 3).as("kern"),
      flatten(array(declGrams(1), declGrams(2), declGrams(3))).as("decl"))
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getInt(0), x.getString(1))).sorted
      val d = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getInt(0), x.getString(1))).sorted
      assert(k == d)
    }
  }

  test("ReadabilityCountsExpression equals the declarative regexp form") {
    val df = samples(200).toDF("text")
    val toks = split(col("text"), " ")
    val declW = size(toks).cast(LongType)
    val declS = greatest(lit(1L),
      length(regexp_replace(col("text"), "[^.!?]", "")).cast(LongType))
    val declSyl = aggregate(
      transform(split(lower(col("text")), " "),
        t => greatest(lit(1), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))))
          .cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val r = TextHashFunctions.readabilityCounts(col("text"))
    val bad = df.select(col("text"),
      r.getField("w").as("kw"), declW.as("dw"),
      r.getField("s").as("ks"), declS.as("ds"),
      r.getField("syl").as("ksyl"), declSyl.as("dsyl"))
      .filter(col("kw") =!= col("dw") || col("ks") =!= col("ds") ||
        col("ksyl") =!= col("dsyl"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
