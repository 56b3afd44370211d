package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Sketch-guided EXACT heavy hitters (frequent tokens) — the operator a
 * vocabulary/stopword audit runs over a 100 TB corpus.
 *
 * Naive plan: explode every token and hash-aggregate the full vocabulary
 * — one shuffle carrying every distinct token, dominated by the long
 * tail that the query is going to throw away. This plan instead runs
 * Misra–Gries (1982) summaries per partition (map-only, bounded
 * `denom-1` counters), unions the surviving candidates (≤ (denom-1) ×
 * numPartitions strings on the driver), and exact-counts ONLY the
 * candidates — so the shuffle carries at most `denom-1` distinct keys
 * per mapper after partial aggregation, independent of vocabulary size.
 *
 * The sketch never costs exactness: a token with global count
 * > n/denom has, by pigeonhole over partitions, local count
 * > n_p/denom in at least one partition p, and Misra–Gries with
 * k = denom-1 counters underestimates any count by at most n_p/denom —
 * so that token survives partition p's summary with a positive counter.
 * The candidate union is therefore a SUPERSET of the true heavy
 * hitters, and the exact confirm pass makes the final answer precisely
 * `{token : count(token) * denom > n}` — identical to the naive plan
 * and to the DuckDB oracle. (Same sketch-then-exact-confirm shape as
 * the Bloom contamination pre-screen in q73.)
 */
object HeavyHitters {

  /** Misra–Gries streaming summary of one partition: at most k counters.
    * Returns the surviving candidate tokens (counts are not needed —
    * the exact pass recounts). Package-private for the PropertySpec
    * superset-guarantee gate. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val w = it.next()
      val cur = counters.get(w)
      if (cur != null) counters.put(w, cur + 1L)
      else if (counters.size < k) counters.put(w, 1L)
      else {
        // decrement-all step: each unit pays for one prior increment,
        // so total work stays O(stream length) amortized
        val entries = counters.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue == 1L) entries.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala
  }

  /**
   * Tokens of `textCol` (space-split) whose global count × denom
   * strictly exceeds the total token count. Output: (w, c) — exact.
   */
  def frequentTokens(docs: DataFrame, textCol: String, denom: Int): DataFrame = {
    require(denom >= 2, "denom must be >= 2")
    val spark = docs.sparkSession
    val toks = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .select(col("w")).as[String](Encoders.STRING)

    // pass 1 (map-only): per-partition MG summaries; tiny driver collect
    val k = denom - 1
    val candidates = toks
      .mapPartitions(it => misraGries(it, k))(Encoders.STRING)
      .distinct().collect().toSeq

    // exact total without an explode: one 1-row aggregate over doc lengths
    val total = docs
      .select(size(split(col(textCol), " ")).cast(LongType).as("n"))
      .agg(sum(col("n")).as("n")).head().getLong(0)

    // pass 2: exact counts of candidates only — the in-set filter drops
    // the vocabulary tail BEFORE the shuffle; partial agg bounds each
    // mapper's output at k rows
    toks.where(col("w").isInCollection(candidates))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") * denom > total)
      .select(col("w"), col("c"))
  }
}
