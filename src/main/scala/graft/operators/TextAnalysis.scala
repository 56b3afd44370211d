package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID, quality scoring, token counting, document fingerprinting.
 *
 * Everything here is built from codegen'd `org.apache.spark.sql.functions`
 * higher-order array expressions — no UDFs, no driver round trips — so at
 * 100 TB each operator is a pure map over the scan with full whole-stage
 * codegen and no shuffle (aggregation happens only if the caller groups).
 *
 * (The reference exposes no text analytics of its own — PyAirbyte renders
 * records to LLM documents, `airbyte/_util/document_rendering.py:37-95` —
 * these operators are the north-star additions per BASELINE.json.)
 */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is space-delimited). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish subword count: each whitespace token contributes
   * ceil(len/4) subword units — a deterministic, engine-portable proxy
   * for BPE token counts (integer arithmetic only, no regex dialects).
   */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + (length(t) + lit(3)).cast(LongType) / lit(4L) cast LongType)

  /** Language-marker scoring: how many tokens appear in `markers`. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(m => m: Any): _*)))

  /**
   * Heuristic language ID over marker-word lists. Deterministic argmax:
   * highest hit count wins; ties resolve to the lexicographically LAST
   * language code (struct `greatest` semantics). Returns "und" when no
   * marker hits at all.
   */
  def langId(text: Column, markerSets: Seq[(String, Seq[String])]): Column = {
    val scored = markerSets.sortBy(_._1).map { case (lang, markers) =>
      struct(markerHits(text, markers).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Stopword ratio = fraction of tokens that are in the stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    markerHits(text, stopwords).cast(DoubleType) /
      greatest(tokenCount(text), lit(1)).cast(DoubleType)

  /** Mean token length (characters), exact decimal-free formulation. */
  def meanTokenLength(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType) / greatest(tokenCount(text), lit(1)).cast(DoubleType)

  /**
   * Composite quality components for filtering. Returns a struct; callers
   * project the fields they filter on so column pruning stays effective.
   */
  def qualityStruct(text: Column, stopwords: Seq[String]): Column = struct(
    tokenCount(text).as("n_tokens"),
    length(text).as("n_chars"),
    meanTokenLength(text).as("mean_token_len"),
    stopwordRatio(text, stopwords).as("stopword_ratio"))

  /**
   * Document fingerprint: minimum MD5 over character 8-gram shingles —
   * the winnowing-lite content signature. Two documents sharing the
   * minimizing shingle collide; robust to small edits elsewhere.
   * String min keeps it engine-portable (no numeric hash conversions).
   */
  def fingerprint(text: Column, gram: Int = 8): Column =
    graft.functions.TextHashFunctions.fingerprint(text, gram)
}
