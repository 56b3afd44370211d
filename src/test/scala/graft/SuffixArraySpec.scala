package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.SuffixArray

/**
 * Suffix-array correctness against a sequential brute force: build the
 * prefix-doubling SA over the full sf0.001 corpus (no shard) and
 * compare every rank and every adjacent-pair LCP with direct suffix
 * sorting/comparison on the driver. Also pins the dense-index
 * primitive's contract (contiguous 1..n in sort order).
 */
class SuffixArraySpec extends SparkTestBase {

  private def corpus(): Map[(Long, Long), Vector[String]] = {
    val docs = graft.sources.Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
    docs.iterator.flatMap { r =>
      val d = r.getLong(0)
      val toks = r.getString(1).split(" ", -1).filter(_.nonEmpty).toVector
      (1 to toks.length).map(p => (d, p.toLong) -> toks.drop(p - 1))
    }.toMap
  }

  /** Lexicographic token-sequence order (element-wise, prefix-first) —
    * the order DuckDB's list comparison and Spark's array ordering use. */
  private val seqOrd: Ordering[Vector[String]] = (a, b) => {
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = a(i).compareTo(b(i))
      i += 1
    }
    if (c != 0) c else a.length.compareTo(b.length)
  }

  test("prefix-doubling ranks equal brute-force dense ranks (full sf0.001)") {
    val sa = SuffixArray.build(
      graft.sources.Tables.documents(spark, sf()), "doc_id", "text")
    val got = sa.ranks.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val suf = corpus()
    assert(got.size == suf.size, "one rank per suffix")
    val sortedDistinct = suf.values.toVector.distinct.sorted(seqOrd)
    val expect = sortedDistinct.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    suf.foreach { case (k, s) =>
      assert(got(k) == expect(s), s"rank mismatch at $k")
    }
  }

  test("LCP descent equals brute-force common-prefix on adjacent pairs") {
    val docs = graft.sources.Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 0)
    val sa = SuffixArray.build(docs, "doc_id", "text")
    val ord = SuffixArray.order(sa).localCheckpoint()
    val pairs = ord.as("a")
      .join(ord.as("b"), col("b.rn") === col("a.rn") + 1)
      .select(col("a.d").as("da"), col("a.p").as("pa"),
        col("b.d").as("db"), col("b.p").as("pb"))
    val got = SuffixArray.lcp(sa, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getLong(4))
      .toMap

    val suf = corpus().filter(_._1._1 % 10 == 0)
    def brute(a: Vector[String], b: Vector[String]): Long = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      i.toLong
    }
    assert(got.nonEmpty)
    got.foreach { case ((da, pa, db, pb), l) =>
      assert(l == brute(suf((da, pa)), suf((db, pb))),
        s"lcp mismatch for ($da,$pa)-($db,$pb)")
    }
    // adjacency covers every suffix once as a left element except the last
    assert(got.size == suf.size - 1)
  }

  test("denseIndex: contiguous 1..n in sort order") {
    import spark.implicits._
    val df = Seq("pear", "apple", "fig", "banana", "apple")
      .toDF("w").distinct()
    val idx = SuffixArray.denseIndex(df, Seq("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("apple" -> 1L, "banana" -> 2L, "fig" -> 3L, "pear" -> 4L))
  }
}
