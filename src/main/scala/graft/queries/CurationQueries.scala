package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHashFunctions
import graft.sources.Tables

/**
 * Corpus curation queries: Gopher-style quality rules and data-mixture
 * sampling — the two curation stages between raw ingest and training.
 *
 * Parity design: every rule decision is INTEGER arithmetic (no float
 * thresholds); the mixture sampler draws its uniform from an md5 prefix
 * (portable, partition-independent) against a threshold derived from
 * one identically-structured double expression in both engines.
 */
object CurationQueries {

  // ------------------------------------------------------------------
  // q64: Gopher quality rules (Rae et al. 2021, appendix A1.1, adapted
  // to the corpus): word-count floor, mean-word-length band, stopword
  // presence, top-word concentration. All per-row computations —
  // zero-shuffle until the final tally; the top-word signal is a
  // compiled kernel (TopWordCountExpression), not an explode+groupBy
  // (which would shuffle every word of every doc).
  // Rules as integer comparisons:
  //   R1: n_words >= 50
  //   R2: 3·n_words <= n_word_chars <= 10·n_words   (mean len in [3,10])
  //   R3: >= 2 distinct stopwords of {the, a, and, of} present
  //   R4: top_word_count · 5 <= n_words             (<= 20% one word)
  // ------------------------------------------------------------------
  def q64GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nWords = size(split(col("text"), " ")).cast(LongType)
    val nWordChars = (length(col("text")) - (nWords - 1)).cast(LongType)
    val padded = concat(lit(" "), col("text"), lit(" "))
    val nStop = Seq("the", "a", "and", "of")
      .map(w => when(padded.contains(s" $w "), 1L).otherwise(0L))
      .reduce(_ + _)
    val topCount = TextHashFunctions.topWordCount(col("text")).cast(LongType)
    val scored = docs.select(col("lang"),
      (nWords >= 50).as("r1"),
      (nWordChars >= nWords * 3 && nWordChars <= nWords * 10).as("r2"),
      (nStop >= 2).as("r3"),
      (topCount * 5 <= nWords).as("r4"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("r1"), 0L).otherwise(1L)).as("n_fail_wordcount"),
        sum(when(col("r2"), 0L).otherwise(1L)).as("n_fail_meanlen"),
        sum(when(col("r3"), 0L).otherwise(1L)).as("n_fail_stopwords"),
        sum(when(col("r4"), 0L).otherwise(1L)).as("n_fail_topword"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
          .otherwise(0L)).as("n_pass"))
  }

  val q64Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_words,
      |    length(text) - (len(string_split(text, ' ')) - 1) AS n_word_chars,
      |    (CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END +
      |     CASE WHEN ' ' || text || ' ' LIKE '% a %' THEN 1 ELSE 0 END +
      |     CASE WHEN ' ' || text || ' ' LIKE '% and %' THEN 1 ELSE 0 END +
      |     CASE WHEN ' ' || text || ' ' LIKE '% of %' THEN 1 ELSE 0 END) AS n_stop
      |  FROM documents),
      |top AS (
      |  SELECT doc_id, MAX(c) AS top_count FROM (
      |    SELECT doc_id, w, COUNT(*) AS c
      |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |    WHERE w <> '' GROUP BY doc_id, w) GROUP BY doc_id),
      |scored AS (
      |  SELECT b.lang,
      |    b.n_words >= 50 AS r1,
      |    b.n_word_chars >= b.n_words * 3 AND b.n_word_chars <= b.n_words * 10 AS r2,
      |    b.n_stop >= 2 AS r3,
      |    t.top_count * 5 <= b.n_words AS r4
      |  FROM base b JOIN top t USING (doc_id))
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_wordcount,
      |  CAST(SUM(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_meanlen,
      |  CAST(SUM(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_stopwords,
      |  CAST(SUM(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_topword,
      |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      |FROM scored GROUP BY lang""".stripMargin

  // ------------------------------------------------------------------
  // q65: data-mixture balancing — downsample over-represented languages
  // toward a UNIFORM target mix. Acceptance rate per lang =
  // min(1, total/(n_langs·count)); each doc draws its uniform from its
  // md5 prefix (deterministic, partition-independent, reproducible at
  // any scale) against a 24-bit threshold floor(rate·16^6). Rates ride
  // a broadcast join back onto the scan — the second pass is
  // shuffle-free, same shape as q58.
  // ------------------------------------------------------------------
  def q65DomainMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_langs"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1.0),
        col("total").cast(DoubleType) /
          (col("n_langs").cast(DoubleType) * col("cnt").cast(DoubleType))))
      .withColumn("thr", format_string("%06x",
        floor(col("rate") * 16777216.0).cast(LongType)))
      .select(col("lang").as("rl"), col("rate"), col("thr"))
    docs.join(broadcast(rates), col("lang") === col("rl"))
      .withColumn("u6", substring(md5(col("doc_id").cast(StringType)), 1, 6))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u6") < col("thr"), 1L).otherwise(0L)).as("n_sampled"),
        round(max(col("rate")), 4).as("rate"))
  }

  val q65Sql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
      |totals AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_langs FROM counts),
      |rates AS (
      |  SELECT lang, cnt,
      |    least(1.0, CAST(total AS DOUBLE) / (CAST(n_langs AS DOUBLE) * CAST(cnt AS DOUBLE))) AS rate
      |  FROM counts CROSS JOIN totals),
      |thr AS (
      |  SELECT lang, rate,
      |    printf('%06x', CAST(floor(rate * 16777216.0) AS BIGINT)) AS thr
      |  FROM rates)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < t.thr
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  round(MAX(t.rate), 4) AS rate
      |FROM documents d JOIN thr t ON d.lang = t.lang
      |GROUP BY d.lang""".stripMargin
}
