package graft

import graft.operators.Unigram

/** Unigram-LM tokenizer (q155): Viterbi segmentation semantics and
  * the distributed hard-EM loop pinned to a sequential reference
  * (same contract as BpeSpec/CoresetSpec for driver-loop operators
  * whose iterations a single SQL oracle can't express). */
class UnigramSpec extends SparkTestBase {

  test("viterbi picks the max-probability segmentation") {
    val logp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -2.0)
    assert(Unigram.segment("abc", logp) == Seq("ab", "c"))
    assert(Unigram.segment("cab", logp) == Seq("c", "ab"))
    // 'ab'+'c' (-3) beats 'a'+'b'+'c' (-6)
    assert(Unigram.segment("ab", logp) == Seq("ab"))
  }

  test("viterbi tie-break keeps the longest piece") {
    // "ab" and "a"+"b" tie at -4.0 → longest-first scan wins
    val logp = Map("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    assert(Unigram.segment("ab", logp) == Seq("ab"))
  }

  test("unreachable suffix falls back to character split") {
    val logp = Map("a" -> -1.0) // 'x' is not a piece
    assert(Unigram.segment("ax", logp) == Seq("a", "x"))
  }

  test("distributed EM matches a sequential reference") {
    import spark.implicits._
    val texts = Seq(
      "the merge the merge table", "merge table scan the",
      "scan scan the merge", "table the the scan merge")
    val df = texts.toDF("text")
    val out = Unigram.learn(df, "text", seedSize = 12, iters = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq

    // ---- sequential reference: same seeding + EM, plain collections
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val subFreq = words.toSeq.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(4, w.length - i)
      } yield (w.substring(i, i + l), c)
    }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
    val chars = subFreq.filter(_._1.length == 1)
    val top = subFreq.toSeq.sortBy { case (p, c) => (-c, p) }.take(12)
    var pieces: Map[String, Long] = (top ++ chars).toMap
    for (_ <- 1 to 2) {
      val total = pieces.values.sum.toDouble
      val logp = pieces.map { case (p, c) => p -> r6(math.log(c / total)) }
      val counts = words.toSeq.flatMap { case (w, c) =>
        Unigram.segment(w, logp).map(p => (p, c))
      }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      pieces = counts ++ chars.collect {
        case (p, _) if !counts.contains(p) => p -> 1L
      }
    }
    val total = pieces.values.sum.toDouble
    val expected = pieces.toSeq.sortBy { case (p, c) => (-c, p) }.take(10)
      .zipWithIndex.map { case ((p, c), i) =>
        (i + 1L, p, c, BigDecimal(c / total).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(out == expected)
  }

  test("output is independent of input partitioning") {
    import spark.implicits._
    val texts = (1 to 40).map(i => s"alpha beta gamma delta e${i % 7}")
    val a = Unigram.learn(texts.toDF("text").repartition(1), "text",
      seedSize = 20, iters = 2, topK = 8).collect().toSeq
    val b = Unigram.learn(texts.toDF("text").repartition(13), "text",
      seedSize = 20, iters = 2, topK = 8).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getString(1).length <= 4))
  }
}
