package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Unigram-LM tokenizer learning (Kudo 2018, "Subword Regularization"
 * — the SentencePiece unigram model), hard-EM variant: the E-step
 * assigns each word its single Viterbi-best segmentation under the
 * current piece log-probabilities, the M-step re-estimates piece
 * probabilities from the assigned counts. The BPE dual
 * ([[Bpe.learnMerges]]) GROWS a vocabulary by merging; unigram STARTS
 * from an over-complete candidate set (all short substrings) and lets
 * probability mass concentrate — pieces the Viterbi paths stop using
 * drop out.
 *
 * Scale shape (same contract as BPE): statistics live on the WORD
 * VOCABULARY, never the corpus — one corpus-sized hash aggregation up
 * front collapses to (word, count), then every EM iteration is a
 * vocabulary-sized flatMap (per-word Viterbi, genuine imperative
 * per-element logic) into a map-side-combined piece tally whose result
 * is PIECE-TABLE-sized (≤ seedSize + alphabet, driver-held and
 * broadcast back). Nothing corpus-sized moves after the first shuffle.
 *
 * Determinism: seeding ranks by (freq DESC, piece ASC); Viterbi scans
 * candidate start positions longest-piece-first and replaces only on
 * strictly-greater score, so ties keep the longest piece — a total
 * order independent of partitioning. Log-probs are rounded to 6 dp at
 * the ln() exit (the suite's transcendental-parity convention), so
 * scores compare identically everywhere.
 */
object Unigram {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val MaxPieceLen = 4

  /** One EM iteration's corpus plan over the (w, cnt) word vocabulary:
    * per-word Viterbi flatMap into ONE map-side-combined piece tally —
    * the piece-table-sized result is the only thing that crosses an
    * exchange. Package-visible so the loop-iteration plan gate
    * (ExchangeBudgetSpec) can pin that single-shuffle budget. */
  private[graft] def emStepPlan(
      words: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Map[String, Double]]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.as[(String, Long)].flatMap { case (w, c) =>
      segment(w, bc.value).map(p => (p, c))
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .toDF("p", "c")
  }

  /** Viterbi-best segmentation of `w` under piece log-probs; words
    * with an unreachable suffix (impossible while every character is a
    * piece) fall back to character split. Exposed for the spec's
    * sequential reference. */
  def segment(w: String, logp: Map[String, Double]): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) { // i ascending = longest candidate first
        if (best(i) != Double.NegativeInfinity) {
          logp.get(w.substring(i, j)) match {
            case Some(lp) =>
              val s = best(i) + lp
              if (s > best(j)) { best(j) = s; from(j) = i }
            case None => ()
          }
        }
        i += 1
      }
      j += 1
    }
    if (from(n) == -1 && n > 0) return w.map(_.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += w.substring(from(p), p); p = from(p) }
    out.reverse.toSeq
  }

  /**
   * Learn a unigram piece table from a text column. Returns the top-k
   * pieces: (rank, piece, piece_cnt, prob) with prob rounded to 4 dp,
   * ranked by (count DESC, piece ASC).
   */
  def learn(df: DataFrame, textCol: String, seedSize: Int = 60,
      iters: Int = 2, topK: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // corpus → word vocabulary (the ONE corpus-sized aggregation)
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .localCheckpoint() // re-scanned once per EM iteration

    // seed: all substrings of length 1..MaxPieceLen, weighted by word
    // count; top seedSize by (freq DESC, piece ASC) plus every single
    // character (coverage guarantee: segmentation can never dead-end)
    val subFreq = words.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(MaxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), c)
    }.toDF("p", "c").groupBy(col("p")).agg(sum(col("c")).as("c"))
      .localCheckpoint() // read twice: top-k and the alphabet slice
    // only piece-table-sized rows ever reach the driver: the top-k
    // (TakeOrdered — per-partition heaps, no global sort) + alphabet
    val top = subFreq.orderBy(col("c").desc, col("p")).limit(seedSize)
      .as[(String, Long)].collect().toSeq
    val chars = subFreq.filter(length(col("p")) === 1)
      .as[(String, Long)].collect().toSeq
    var pieces: Map[String, Long] = (top ++ chars).toMap

    def toLogp(tbl: Map[String, Long]): Map[String, Double] = {
      val total = tbl.values.sum.toDouble
      tbl.map { case (p, c) => p -> r6(math.log(c / total)) }
    }

    var it = 0
    while (it < iters) {
      val logp = toLogp(pieces)
      val bc = spark.sparkContext.broadcast(logp)
      val counts = emStepPlan(words.toDF("w", "cnt"), bc)
        .as[(String, Long)]
        .collect().toMap
      // unused single chars stay with a floor count of 1 so coverage
      // survives (standard smoothing; everything else drops out)
      pieces = counts ++ chars.collect {
        case (p, _) if !counts.contains(p) => p -> 1L
      }
      bc.destroy()
      it += 1
    }

    val total = pieces.values.sum.toDouble
    val ranked = pieces.toSeq.sortBy { case (p, c) => (-c, p) }.take(topK)
      .zipWithIndex.map { case ((p, c), i) =>
        (i + 1L, p, c, BigDecimal(c / total).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    spark.createDataset(ranked)
      .toDF("rank", "piece", "piece_cnt", "prob")
  }
}
