package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed byte-pair-encoding merge learning (Sennrich et al. 2016,
 * "Neural Machine Translation of Rare Words with Subword Units" — the
 * tokenizer-training step of an LLM data pipeline).
 *
 * Scale shape: BPE statistics live on the WORD VOCABULARY, not the
 * corpus — the first aggregation collapses the corpus to (word, count)
 * (one hash shuffle, map-side combined), and every merge iteration
 * after that runs on the vocabulary table only (millions of rows at
 * web scale, not billions). Per iteration: one pair-count aggregation
 * (vocab-sized shuffle) and ONE collected row (the argmax pair) — the
 * driver never holds more than the k learned merges. The symbol-array
 * rewrite is a per-row greedy left-to-right scan (genuine imperative
 * per-element logic — a typed map, kept off the shuffle path).
 *
 * Determinism: the winning pair is (count DESC, left ASC, right ASC) —
 * a total order, so learned merges are reproducible across partitionings.
 */
/** (word-as-symbol-array, count) vocabulary row — top-level so Spark's
  * bean/product encoder codegen can reach the constructor. */
case class BpeVocab(syms: Seq[String], cnt: Long)

object Bpe {

  /** Adjacent-pair counts over the current symbol vocabulary.
    * (Fully-merged single-symbol words carry no pairs — and Spark's
    * `sequence(1, 0)` counts DOWN, so they must not reach the lambda.) */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS l, syms[i] AS r))"))
        .as("p"), col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /**
   * Learn `k` merges from a text column. Returns one row per merge:
   * (step, left, right, merged, pair_cnt), step = 1..k in learning order.
   */
  def learnMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // corpus → word vocabulary with counts; words split to char symbols.
    var vocab: DataFrame = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("cnt"))
      .localCheckpoint() // each iteration rewrites this frame

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    while (step <= k) {
      // argmax over the vocabulary-sized pair table: ONE row to the driver.
      val top = pairCounts(vocab)
        .orderBy(col("pair_cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) { step = k + 1 }
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, l + r, c))
        // greedy left-to-right merge of (l, r) occurrences in each word —
        // the canonical BPE rewrite (non-overlapping, restart after merge).
        val mergedVocab = vocab.as[BpeVocab].map { v =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < v.syms.length) {
            if (i + 1 < v.syms.length && v.syms(i) == l && v.syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += v.syms(i); i += 1 }
          }
          BpeVocab(out.toSeq, v.cnt)
        }.toDF("syms", "cnt").localCheckpoint()
        vocab = mergedVocab
        step += 1
      }
    }
    merges.toSeq.toDF("step", "left", "right", "merged", "pair_cnt")
  }

  /**
   * Apply a learned merge table to a text column: per-document token
   * count under the subword vocabulary plus the char/token compression
   * ratio — the "how many tokens will this corpus cost" estimator run
   * before a training job. Merges apply in LEARNED ORDER, each as a
   * greedy left-to-right non-overlapping rewrite (the canonical BPE
   * encode). Per-row imperative scan via a typed map — zero shuffle;
   * the merge table (k rows) ships in the closure like a broadcast
   * variable.
   *
   * @param merges (left, right) pairs in learning order
   * @return input columns + n_tokens (long)
   */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    df.select(col(idCol).cast(LongType).as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        var total = 0L
        text.split(" ").foreach { w =>
          if (w.nonEmpty) {
            var syms: Array[String] = w.map(_.toString).toArray
            ms.foreach { case (l, r) =>
              if (syms.length >= 2) {
                val out = scala.collection.mutable.ArrayBuffer.empty[String]
                var i = 0
                while (i < syms.length) {
                  if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                    out += l + r; i += 2
                  } else { out += syms(i); i += 1 }
                }
                syms = out.toArray
              }
            }
            total += syms.length
          }
        }
        (id, total)
      }
      .toDF(idCol, "n_tokens")
  }
}
