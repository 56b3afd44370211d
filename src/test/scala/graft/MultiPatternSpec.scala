package graft

import org.apache.spark.sql.functions._

import graft.functions.{AhoCorasick, MultiPatternFunctions}

/** Aho-Corasick multi-pattern counting (q157's kernel): replace-
  * equivalence (greedy non-overlapping counts), the self-overlap and
  * shared-prefix traps, and plan-level evaluation. */
class MultiPatternSpec extends SparkTestBase {

  /** The oracle identity the kernel must reproduce. */
  private def replaceCount(text: String, p: String): Long =
    ((text.length - text.replace(p, "").length) / p.length).toLong

  test("counts equal the replace-length identity on random text") {
    val rnd = new scala.util.Random(7)
    val pats = Seq("ab", "aba", "ba", "aa", "cab", "b")
    val ac = new AhoCorasick(pats)
    for (_ <- 1 to 3000) {
      val t = (1 to rnd.nextInt(40)).map(_ => "abc" (rnd.nextInt(3))).mkString
      val got = ac.counts(t).toSeq
      val want = pats.map(replaceCount(t, _))
      assert(got == want, s"text=$t got=$got want=$want")
    }
  }

  test("self-overlapping pattern counts non-overlapping occurrences") {
    val ac = new AhoCorasick(Seq("aa"))
    assert(ac.counts("aaaa").toSeq == Seq(2L)) // not 3 (all matches)
    assert(ac.counts("aaa").toSeq == Seq(1L))
  }

  test("patterns sharing prefixes/suffixes count independently") {
    val ac = new AhoCorasick(Seq("ab", "abc", "bc"))
    assert(ac.counts("abc").toSeq == Seq(1L, 1L, 1L))
    assert(ac.counts("ababc").toSeq == Seq(2L, 1L, 1L))
  }

  test("characters outside the pattern alphabet reset cleanly") {
    val ac = new AhoCorasick(Seq("hash join"))
    assert(ac.counts("hash Xjoin hash join!").toSeq == Seq(1L))
    assert(ac.counts("").toSeq == Seq(0L))
  }

  test("expression evaluates in a Spark plan (codegen path)") {
    import spark.implicits._
    val pats = Seq("merge", "table scan")
    val df = Seq("merge the table scan then merge", (null: String))
      .toDF("text")
      .select(MultiPatternFunctions.multiPatternCount(col("text"), pats).as("c"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0) == Seq(2L, 1L))
    assert(rows(1).isNullAt(0))
  }
}
