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

  // ------------------------------------------------------------------
  // q70: BM25-style keyword retrieval (Robertson/Sparck Jones) — tf is
  // a per-row array scan (zero shuffle; no exploded posting list for a
  // 3-term query), df/N/avgdl are ONE tiny corpus aggregate broadcast
  // back, and the global top-10 is TakeOrderedAndProject (map-side
  // pruned). Uses the RATIONAL idf (N−df+0.5)/(df+0.5) rather than its
  // log: `ln` is not bit-identical across libm implementations, while
  // rational-of-integers doubles are — monotonicity (and therefore
  // ranking) is unchanged. k1=1.2, b=0.75.
  // ------------------------------------------------------------------
  private val QueryTerms = Seq("spark", "merge", "vector")

  def q70KeywordSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val withTf = QueryTerms.zipWithIndex.foldLeft(
        docs.withColumn("dl", size(col("w")).cast(LongType))) {
      case (df, (t, i)) => df.withColumn(s"tf$i",
        size(filter(col("w"), x => x === lit(t))).cast(LongType))
    }
    val corpusAggs = Seq(
      count(lit(1)).as("n_docs_total"),
      sum(col("dl")).as("sum_dl")) ++
      QueryTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val corpus = withTf.agg(corpusAggs.head, corpusAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(corpus))
      .withColumn("avgdl",
        col("sum_dl").cast(DoubleType) / col("n_docs_total").cast(DoubleType))
    val score = QueryTerms.indices.map { i =>
      val tf = col(s"tf$i").cast(DoubleType)
      val dfT = col(s"df$i").cast(DoubleType)
      val n = col("n_docs_total").cast(DoubleType)
      val idf = (n - dfT + lit(0.5)) / (dfT + lit(0.5))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) / col("avgdl")))
    }.reduce(_ + _)
    scored.withColumn("score", round(score, 4))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
      .select(col("doc_id"), col("score"))
  }

  val q70Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tf AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
      |    CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf0,
      |    CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf1,
      |    CAST(len(list_filter(w, x -> x = 'vector')) AS BIGINT) AS tf2
      |  FROM d),
      |corpus AS (
      |  SELECT COUNT(*) AS n_docs_total, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
      |    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
      |    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      |  FROM tf),
      |scored AS (
      |  SELECT doc_id,
      |    round(
      |      ((CAST(n_docs_total AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
      |        * (CAST(tf0 AS DOUBLE) * 2.2)
      |        / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs_total AS DOUBLE)))) +
      |      ((CAST(n_docs_total AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
      |        * (CAST(tf1 AS DOUBLE) * 2.2)
      |        / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs_total AS DOUBLE)))) +
      |      ((CAST(n_docs_total AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
      |        * (CAST(tf2 AS DOUBLE) * 2.2)
      |        / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs_total AS DOUBLE)))), 4) AS score
      |  FROM tf CROSS JOIN corpus)
      |SELECT doc_id, score FROM scored
      |WHERE score > 0
      |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  // ------------------------------------------------------------------
  // q75: training-sequence packing — assign each document to the
  // fixed-size context window (2048 tokens) in which it STARTS when
  // the corpus is laid out in a deterministic order (md5 of doc_id).
  // The naive formulation is a running sum over ONE global ordering —
  // a single-partition window sort, the classic scale killer. Here the
  // prefix sum is DISTRIBUTED two-phase: the first hex digit of the
  // order key forms 16 lexicographic buckets that partition the global
  // order; phase 1 aggregates per-bucket token totals (tiny — 16 rows)
  // and turns them into exclusive prefix offsets on the driver; phase 2
  // runs the running sum WITHIN each bucket in parallel (+ its bucket's
  // offset). Same recurrence a 1000-executor scan would use, and the
  // result is identical to the global window by construction.
  // ------------------------------------------------------------------
  def q75SequencePack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ctx = 2048L
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast(StringType)).as("ord"),
        size(split(col("text"), " ")).cast(LongType).as("tokens"))
      .withColumn("bucket", substring(col("ord"), 1, 1))
    // phase 1: per-bucket totals → exclusive prefix offsets (16 rows)
    val totals = docs.groupBy(col("bucket")).agg(sum(col("tokens")).as("btok"))
      .orderBy(col("bucket")).collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val o = (r.getString(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("bucket", "offset")
    // phase 2: within-bucket running sums, parallel across buckets
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("ord").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(offDf), Seq("bucket"))
      .withColumn("cum", sum(col("tokens")).over(w) + col("offset"))
      .withColumn("seq_id", expr(s"(cum - tokens) div $ctx").cast(LongType))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
  }

  val q75Sql: String =
    """WITH d AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ord,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tokens,
      |    SUM(tokens) OVER (ORDER BY ord ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT CAST((cum - tokens) // 2048 AS BIGINT) AS seq_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tokens) AS BIGINT) AS n_tokens
      |FROM c GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q77: overlapping document chunking (RAG / context-window prep) —
  // split each document into 32-word chunks with 8 words of overlap
  // (stride 24). Pure per-row compute: the chunk index range is a
  // `sequence` exploded per document and each chunk is an array slice —
  // zero shuffle, fully codegen'd, embarrassingly parallel at any
  // scale. Chunk content parity is proven by md5 of the re-joined
  // words; chunk count = ceil(max(n−overlap,1) / stride) in pure
  // integer arithmetic.
  // ------------------------------------------------------------------
  def q77Chunk(spark: SparkSession, dir: String): DataFrame = {
    val (chunk, overlap) = (32, 8)
    val step = chunk - overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("n", size(col("words")).cast(LongType))
      .withColumn("nc", expr(s"(greatest(n - $overlap, 1) + ${step - 1}) div $step"))
      .select(col("doc_id"), col("words"), col("n"),
        explode(expr("sequence(0, nc - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(chunk.toLong), col("n") - col("chunk_id") * step)
          .as("n_chunk_tokens"),
        md5(array_join(slice(col("words"),
          (col("chunk_id") * step + 1).cast(IntegerType), lit(chunk)), " "))
          .as("chunk_md5"))
  }

  // ------------------------------------------------------------------
  // q83: token-distribution Shannon entropy — the "boilerplate vs
  // natural text vs noise" curation signal. Per-row COMPILED kernel
  // (WordEntropyExpression): one pass over each doc's tokens, ZERO
  // shuffle at any corpus size; the relational formulation the oracle
  // uses (explode → count per (doc, word) → entropy fold) shuffles
  // every token of every document. Float parity: both engines compute
  // the SAME expression shape, log2(n) − Σ c·log2(c)/n, rounded 6 dp.
  // ------------------------------------------------------------------
  def q83TokenEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).cast(LongType)
          .as("n_tokens"),
        round(TextHashFunctions.wordEntropy(col("text")), 6).as("entropy"))

  val q83Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |counts AS (
      |  SELECT doc_id, w, COUNT(*) AS c FROM words WHERE w <> ''
      |  GROUP BY doc_id, w),
      |per_doc AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    round(log2(CAST(SUM(c) AS DOUBLE))
      |      - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE),
      |      6) AS entropy
      |  FROM counts GROUP BY doc_id)
      |SELECT doc_id, n_tokens, entropy FROM per_doc""".stripMargin

  // ------------------------------------------------------------------
  // q85: inverted-index (posting-list) construction — term → document
  // frequency, total term frequency, and a bounded sample of postings.
  // Two-level aggregation: (term, doc) first — map-side partials
  // collapse a doc's repeated terms before the shuffle and the result
  // IS the posting-list entry (term, doc, tf) — then per-term counts
  // plus a BOUNDED min-id sample via the TopKAggregate heap (score
  // −doc_id ⇒ ascending ids). No per-term state ever exceeds 20
  // entries, where collect_set+sort_array would buffer every posting
  // of a viral term (the full index shards by term at 100 TB; the
  // capped sample is the segment-local list a search engine serves).
  // ------------------------------------------------------------------
  def q85PostingLists(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf_in_doc"))
      .groupBy(col("term"))
      .agg(sum(col("tf_in_doc")).as("tf_total"),
        count(lit(1)).as("df"),
        graft.functions.TopKAggregate.topK(
          -col("doc_id").cast(DoubleType), col("doc_id"), 20).as("top"))
      .select(col("term"), col("tf_total"), col("df"),
        expr("array_join(transform(top, x -> cast(x.id as string)), ',')")
          .as("postings_sample"))

  val q85Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |SELECT term, COUNT(*) AS tf_total,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
      |  array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 20), ',')
      |    AS postings_sample
      |FROM words WHERE term <> ''
      |GROUP BY term""".stripMargin

  // ------------------------------------------------------------------
  // q86: length-curriculum binning — bucket documents by token count
  // into quartiles for curriculum scheduling / packing efficiency. The
  // naive ntile() is a GLOBAL single-partition window sort (the scale
  // killer); instead the three quartile boundaries come from ONE exact
  // percentile aggregate (q53 proved percentile ≡ quantile_cont bit
  // parity) and each row's bin is pure comparison arithmetic against
  // the broadcast boundaries — the corpus scan never shuffles a full
  // sort, and the result is partition-count independent.
  // ------------------------------------------------------------------
  def q86LengthBins(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("tokens"))
    val bounds = toks.agg(
      expr("percentile(tokens, 0.25)").as("p25"),
      expr("percentile(tokens, 0.5)").as("p50"),
      expr("percentile(tokens, 0.75)").as("p75"))
    toks.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("tokens").cast(DoubleType) <= col("p25"), 0L)
          .when(col("tokens").cast(DoubleType) <= col("p50"), 1L)
          .when(col("tokens").cast(DoubleType) <= col("p75"), 2L)
          .otherwise(3L))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("tokens")).as("min_tokens"),
        max(col("tokens")).as("max_tokens"),
        sum(col("tokens")).as("total_tokens"))
  }

  val q86Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |bounds AS (
      |  SELECT quantile_cont(tokens, 0.25) AS p25,
      |    quantile_cont(tokens, 0.5) AS p50,
      |    quantile_cont(tokens, 0.75) AS p75
      |  FROM toks)
      |SELECT CAST(CASE WHEN CAST(tokens AS DOUBLE) <= p25 THEN 0
      |  WHEN CAST(tokens AS DOUBLE) <= p50 THEN 1
      |  WHEN CAST(tokens AS DOUBLE) <= p75 THEN 2
      |  ELSE 3 END AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs,
      |  MIN(tokens) AS min_tokens, MAX(tokens) AS max_tokens,
      |  CAST(SUM(tokens) AS BIGINT) AS total_tokens
      |FROM toks CROSS JOIN bounds
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q89: unigram LM surprisal scoring — the CCNet-style "how unlikely
  // is this document under the corpus language model" curation signal
  // (high = noise/outlier, low = boilerplate). Corpus unigram
  // log-probs are a vocabulary-sized table BROADCAST back onto the
  // token stream (the fact side never reshuffles for the lookup); the
  // per-doc fold is one hash aggregation. Float parity: each token's
  // log2 p is rounded to 6 dp FIRST (identical addends both engines,
  // so summation order cannot drift more than final-ulp), then the
  // per-doc mean rounds to 4.
  // ------------------------------------------------------------------
  def q89LmSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val uc = tok.groupBy(col("t")).agg(count(lit(1)).as("cu"))
    val tot = uc.agg(sum(col("cu")).as("n"))
    val lp = uc.crossJoin(broadcast(tot))
      .select(col("t").as("lt"),
        round(log2(col("cu").cast(DoubleType) / col("n").cast(DoubleType)), 6)
          .as("l2p"))
    tok.join(broadcast(lp), col("t") === col("lt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(col("l2p")) / count(lit(1)), 4).as("avg_surprisal"))
  }

  val q89Sql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      |tok AS (SELECT doc_id, t FROM words WHERE t <> ''),
      |uc AS (SELECT t, COUNT(*) AS cu FROM tok GROUP BY t),
      |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uc),
      |lp AS (
      |  SELECT t, round(log2(CAST(cu AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS l2p
      |  FROM uc CROSS JOIN tot)
      |SELECT d.doc_id, COUNT(*) AS n_tokens,
      |  round(-SUM(l.l2p) / COUNT(*), 4) AS avg_surprisal
      |FROM tok d JOIN lp l ON d.t = l.t GROUP BY d.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q91: duplication inflation — the corpus-level "how much would
  // exact dedup shrink this" audit run before committing to a dedup
  // pass: clusters of identical content, removable copies, and the
  // token mass they carry. One content-hash aggregation (map-side
  // partials collapse repeats per mapper — a viral doc ships one row
  // per partition, not one per copy) followed by a one-row summary.
  // Copies in a cluster are identical, so removable tokens are exactly
  // (size−1) · tokens-per-copy — all BIGINT arithmetic, one final
  // rounded division for the percentage.
  // ------------------------------------------------------------------
  def q91DupInflation(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Tables.documents(spark, dir)
      .select(md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast(LongType).as("toks"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("sz"), max(col("toks")).as("toks"))
    clusters.agg(
        sum(col("sz")).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        sum(col("sz") - 1).as("n_removable_docs"),
        sum(col("sz") * col("toks")).as("n_tokens"),
        sum((col("sz") - 1) * col("toks")).as("n_removable_tokens"))
      .withColumn("removable_pct", round(
        col("n_removable_tokens").cast(DoubleType) * 100.0 /
          col("n_tokens").cast(DoubleType), 4))
  }

  val q91Sql: String =
    """WITH clusters AS (
      |  SELECT md5(text) AS h, COUNT(*) AS sz,
      |    MAX(CAST(len(string_split(text, ' ')) AS BIGINT)) AS toks
      |  FROM documents GROUP BY md5(text))
      |SELECT CAST(SUM(sz) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_clusters,
      |  CAST(SUM(sz - 1) AS BIGINT) AS n_removable_docs,
      |  CAST(SUM(sz * toks) AS BIGINT) AS n_tokens,
      |  CAST(SUM((sz - 1) * toks) AS BIGINT) AS n_removable_tokens,
      |  round(CAST(SUM((sz - 1) * toks) AS DOUBLE) * 100.0 /
      |    CAST(SUM(sz * toks) AS DOUBLE), 4) AS removable_pct
      |FROM clusters""".stripMargin

  // ------------------------------------------------------------------
  // q96: per-source corpus skew audit — the "which sources dominate,
  // and do their documents look different" check run before fixing a
  // training mixture (q65 then consumes the rates). One grouped pass
  // per source (exact percentile state bounded by docs-per-source)
  // plus a one-row corpus total broadcast back; share in integer
  // permille so both engines cut identical values.
  // ------------------------------------------------------------------
  def q96SourceSkew(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("toks"))
    val per = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      min(col("toks")).as("min_tokens"),
      round(expr("percentile(toks, 0.5)"), 4).as("median_tokens"),
      max(col("toks")).as("max_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tt"))
    per.crossJoin(broadcast(tot))
      .withColumn("token_permille", expr("n_tokens * 1000 div tt"))
      .drop("tt")
  }

  val q96Sql: String =
    """WITH d AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents),
      |per AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
      |    CAST(MIN(toks) AS BIGINT) AS min_tokens,
      |    round(quantile_cont(toks, 0.5), 4) AS median_tokens,
      |    CAST(MAX(toks) AS BIGINT) AS max_tokens
      |  FROM d GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM per)
      |SELECT source, n_docs, n_tokens, min_tokens, median_tokens, max_tokens,
      |  n_tokens * 1000 // tt AS token_permille
      |FROM per CROSS JOIN tot""".stripMargin

  // ------------------------------------------------------------------
  // q97: partition-balance audit — measure how evenly a candidate
  // shuffle key spreads rows across buckets BEFORE betting a 100 TB
  // join on it (the skew pre-check that decides between a plain
  // shuffle and q45's salting). Rows bucket by key modulo (the
  // deterministic stand-in for the engine hash, which is not
  // cross-engine portable); the summary reports bucket extremes and a
  // permille imbalance ratio, all integer arithmetic.
  // ------------------------------------------------------------------
  def q97PartitionBalance(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.lineitem(spark, dir)
      .select(pmod(col("l_orderkey"), lit(32L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n")).as("n_rows"),
        min(col("n")).as("min_bucket"),
        max(col("n")).as("max_bucket"))
      .withColumn("imbalance_permille",
        expr("(max_bucket - min_bucket) * 1000 div max_bucket"))
  }

  val q97Sql: String =
    """WITH b AS (
      |  SELECT l_orderkey % 32 AS bucket, COUNT(*) AS n
      |  FROM lineitem GROUP BY 1)
      |SELECT COUNT(*) AS n_buckets, CAST(SUM(n) AS BIGINT) AS n_rows,
      |  CAST(MIN(n) AS BIGINT) AS min_bucket,
      |  CAST(MAX(n) AS BIGINT) AS max_bucket,
      |  (MAX(n) - MIN(n)) * 1000 // MAX(n) AS imbalance_permille
      |FROM b""".stripMargin

  // ------------------------------------------------------------------
  // q100: the full training-data preparation pipeline as ONE
  // distributed plan — the capstone composition of this engine's
  // curation stages, each individually oracle-proven:
  //   1. quality gate (q64's integer Gopher rules R1-R3),
  //   2. exact dedup among survivors (q30: canonical = min doc_id per
  //      content hash, map-side partial min),
  //   3. mixture balancing toward a uniform language target over the
  //      CANONICAL corpus (q65's md5-uniform vs 24-bit threshold —
  //      deterministic at any partitioning),
  //   4. per-language funnel accounting (raw → quality → canonical →
  //      sampled, with sampled token mass).
  // Everything flows through per-doc flags folded in a single final
  // aggregation; the only shuffles are the dedup hash-agg, the tiny
  // per-lang rate aggregate (broadcast back), and the final tally.
  // ------------------------------------------------------------------
  def q100Pipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nWords = size(split(col("text"), " ")).cast(LongType)
    val nWordChars = (length(col("text")) - (nWords - 1)).cast(LongType)
    val padded = concat(lit(" "), col("text"), lit(" "))
    val nStop = Seq("the", "a", "and", "of")
      .map(w => when(padded.contains(s" $w "), 1L).otherwise(0L))
      .reduce(_ + _)
    val flagged = docs.select(col("doc_id"), col("lang"), col("text"),
        nWords.as("toks"),
        (nWords >= 50 && nWordChars >= nWords * 3 &&
          nWordChars <= nWords * 10 && nStop >= 2).as("quality"))
      .withColumn("h", md5(col("text")))
    // canonical = min doc_id per content hash among QUALITY docs
    val canon = flagged.filter(col("quality"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("canon_id"))
    // canon scales with the corpus — a co-shuffled join on the content
    // hash, never a broadcast (AQE may still broadcast at small SF)
    val staged = flagged.join(canon, Seq("h"), "left")
      .withColumn("canonical",
        col("quality") && col("doc_id") === col("canon_id"))
    // uniform-mix acceptance rates over the canonical corpus (q65 shape)
    val counts = staged.filter(col("canonical"))
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_langs"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1.0),
        col("total").cast(DoubleType) /
          (col("n_langs").cast(DoubleType) * col("cnt").cast(DoubleType))))
      .select(col("lang").as("rl"),
        format_string("%06x",
          floor(col("rate") * 16777216.0).cast(LongType)).as("thr"))
    staged.join(broadcast(rates), col("lang") === col("rl"), "left")
      .withColumn("sampled", col("canonical") &&
        substring(md5(col("doc_id").cast(StringType)), 1, 6) < col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("quality"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("canonical"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("sampled"), col("toks")).otherwise(0L)).as("sampled_tokens"))
  }

  val q100Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, text, md5(text) AS h,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
      |    (len(string_split(text, ' ')) >= 50
      |     AND length(text) - (len(string_split(text, ' ')) - 1) >= len(string_split(text, ' ')) * 3
      |     AND length(text) - (len(string_split(text, ' ')) - 1) <= len(string_split(text, ' ')) * 10
      |     AND (CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END +
      |          CASE WHEN ' ' || text || ' ' LIKE '% a %' THEN 1 ELSE 0 END +
      |          CASE WHEN ' ' || text || ' ' LIKE '% and %' THEN 1 ELSE 0 END +
      |          CASE WHEN ' ' || text || ' ' LIKE '% of %' THEN 1 ELSE 0 END) >= 2) AS quality
      |  FROM documents),
      |canon AS (
      |  SELECT h, MIN(doc_id) AS canon_id FROM base WHERE quality GROUP BY h),
      |staged AS (
      |  SELECT b.*, b.quality AND b.doc_id = c.canon_id AS canonical
      |  FROM base b LEFT JOIN canon c USING (h)),
      |counts AS (
      |  SELECT lang, COUNT(*) AS cnt FROM staged WHERE canonical GROUP BY lang),
      |totals AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_langs FROM counts),
      |rates AS (
      |  SELECT lang AS rl,
      |    printf('%06x', CAST(floor(least(1.0,
      |      CAST(total AS DOUBLE) / (CAST(n_langs AS DOUBLE) * CAST(cnt AS DOUBLE)))
      |      * 16777216.0) AS BIGINT)) AS thr
      |  FROM counts CROSS JOIN totals),
      |final AS (
      |  SELECT s.*, s.canonical AND substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 6) < r.thr AS sampled
      |  FROM staged s LEFT JOIN rates r ON s.lang = r.rl)
      |SELECT lang, COUNT(*) AS n_raw,
      |  CAST(SUM(CASE WHEN quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      |  CAST(SUM(CASE WHEN canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
      |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN sampled THEN toks ELSE 0 END) AS BIGINT) AS sampled_tokens
      |FROM final GROUP BY lang""".stripMargin

  // ------------------------------------------------------------------
  // q108: phrase search via POSITIONAL postings — the operator q85's
  // document-level posting lists can't express: "these words, adjacent,
  // in this order". Postings are built for the query terms ONLY (the
  // filter sits before any wide operation, so index state is ∝ the two
  // terms' posting lists, not the corpus), then intersected on
  // (doc, pos+1): an equi-join both engines hash — at scale the join
  // keys are doc-partitioned so each task intersects locally. The
  // naive dual (per-row substring count) is linear in the corpus per
  // query; positional postings amortize across a query workload.
  // ------------------------------------------------------------------
  def q108PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val (w1, w2) = ("table", "hash")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val a = toks.filter(col("w") === w1).select(col("doc_id"), col("pos"))
    val b = toks.filter(col("w") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id").asc)
      .limit(15)
  }

  val q108Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |t AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS term
      |  FROM d)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM t WHERE term = 'table hash'
      |GROUP BY doc_id
      |ORDER BY n_hits DESC, doc_id ASC LIMIT 15""".stripMargin

  // ------------------------------------------------------------------
  // q109: quality-signal ENSEMBLE — single heuristics (q37, q64) gate
  // on absolute thresholds; production curation (FineWeb-style) blends
  // several signals on their per-corpus DISTRIBUTION. Each signal maps
  // to a quartile bucket against exact percentile boundaries computed
  // once and broadcast back (q86's shape — no global sort, no window
  // rank; partition-count independent), and the ensemble score is the
  // integer bucket sum. At 100 TB the exact percentile swaps for
  // percentile_approx with the identical plan. Signals are integer
  // permilles, so bucketing is bit-portable.
  // ------------------------------------------------------------------
  def q109QualityEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("toks", size(col("ws")).cast(LongType))
      .filter(col("toks") > 0)
      .withColumn("uniq_pm", expr("size(array_distinct(ws)) * 1000 div toks"))
      .withColumn("mwl_pm", expr("n_chars * 1000 div toks"))
      .select(col("doc_id"), col("toks"), col("uniq_pm"), col("mwl_pm"))
    val bounds = base.agg(
      expr("percentile(toks, 0.25)").as("t25"),
      expr("percentile(toks, 0.5)").as("t50"),
      expr("percentile(toks, 0.75)").as("t75"),
      expr("percentile(uniq_pm, 0.25)").as("u25"),
      expr("percentile(uniq_pm, 0.5)").as("u50"),
      expr("percentile(uniq_pm, 0.75)").as("u75"),
      expr("percentile(mwl_pm, 0.25)").as("m25"),
      expr("percentile(mwl_pm, 0.5)").as("m50"),
      expr("percentile(mwl_pm, 0.75)").as("m75"))
    def bucket(s: String, p: String) =
      when(col(s).cast(DoubleType) <= col(p + "25"), 0L)
        .when(col(s).cast(DoubleType) <= col(p + "50"), 1L)
        .when(col(s).cast(DoubleType) <= col(p + "75"), 2L)
        .otherwise(3L)
    base.crossJoin(broadcast(bounds))
      .withColumn("score",
        bucket("toks", "t") + bucket("uniq_pm", "u") + bucket("mwl_pm", "m"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"))
  }

  val q109Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
      |    CAST(len(list_distinct(string_split(text, ' '))) * 1000
      |      // len(string_split(text, ' ')) AS BIGINT) AS uniq_pm,
      |    CAST(n_chars * 1000 // len(string_split(text, ' ')) AS BIGINT) AS mwl_pm
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) > 0),
      |bounds AS (
      |  SELECT
      |    quantile_cont(toks, 0.25) AS t25, quantile_cont(toks, 0.5) AS t50,
      |    quantile_cont(toks, 0.75) AS t75,
      |    quantile_cont(uniq_pm, 0.25) AS u25, quantile_cont(uniq_pm, 0.5) AS u50,
      |    quantile_cont(uniq_pm, 0.75) AS u75,
      |    quantile_cont(mwl_pm, 0.25) AS m25, quantile_cont(mwl_pm, 0.5) AS m50,
      |    quantile_cont(mwl_pm, 0.75) AS m75
      |  FROM base)
      |SELECT score, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS min_doc_id
      |FROM (
      |  SELECT doc_id, toks,
      |    CAST(CASE WHEN CAST(toks AS DOUBLE) <= t25 THEN 0
      |          WHEN CAST(toks AS DOUBLE) <= t50 THEN 1
      |          WHEN CAST(toks AS DOUBLE) <= t75 THEN 2 ELSE 3 END
      |     + CASE WHEN CAST(uniq_pm AS DOUBLE) <= u25 THEN 0
      |            WHEN CAST(uniq_pm AS DOUBLE) <= u50 THEN 1
      |            WHEN CAST(uniq_pm AS DOUBLE) <= u75 THEN 2 ELSE 3 END
      |     + CASE WHEN CAST(mwl_pm AS DOUBLE) <= m25 THEN 0
      |            WHEN CAST(mwl_pm AS DOUBLE) <= m50 THEN 1
      |            WHEN CAST(mwl_pm AS DOUBLE) <= m75 THEN 2 ELSE 3 END AS BIGINT) AS score
      |  FROM base CROSS JOIN bounds)
      |GROUP BY score""".stripMargin

  val q77Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS words,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, words, n,
      |    unnest(range(0, (greatest(n - 8, 1) + 23) // 24)) AS chunk_id
      |  FROM d)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_chunk_tokens,
      |  md5(array_to_string(
      |    list_slice(words, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ')) AS chunk_md5
      |FROM x""".stripMargin

  // ------------------------------------------------------------------
  // q122: vocabulary coverage cutoff (tokenizer-prep): the smallest
  // frequency-ranked vocabulary covering 50/90/99% of all token
  // occurrences. Plan: ONE hash-agg shuffle builds the word-count
  // table (partial agg collapses repeats map-side — the corpus never
  // shuffles, only its vocabulary); the cumulative-share window then
  // runs over the counts table, which is |vocab| rows — orders of
  // magnitude smaller than the corpus (a 100 TB crawl has a vocabulary
  // in the tens of millions, fine for one sort), so the
  // single-partition window is the intended plan, not an accident.
  // Threshold selection is INTEGER arithmetic (cum*100 >= n*t) against
  // a 3-row broadcast dimension; min_by picks the cumulative count at
  // the cutoff rank. Deterministic tie-break: (count DESC, word ASC).
  // ------------------------------------------------------------------
  def q122VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val counts = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("w").asc)
    val ordered = counts.select(col("w"), col("c"),
      sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      row_number().over(w).cast(LongType).as("rk"))
    val total = broadcast(counts.agg(sum(col("c")).as("n")))
    val thresholds = broadcast(Seq(50L, 90L, 99L).toDF("threshold_pct"))
    ordered.crossJoin(total)
      .join(thresholds, col("cum") * 100 >= col("n") * col("threshold_pct"))
      .groupBy(col("threshold_pct"))
      .agg(min(col("rk")).as("vocab_size"),
        min_by(col("cum"), col("rk")).as("covered_tokens"),
        max(col("n")).as("total_tokens"))
  }

  val q122Sql: String =
    """WITH tok AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      |counts AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
      |ordered AS (SELECT w, c,
      |    SUM(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum,
      |    ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk
      |  FROM counts),
      |total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
      |th(t) AS (VALUES (CAST(50 AS BIGINT)), (90), (99))
      |SELECT t AS threshold_pct,
      |  CAST(MIN(rk) AS BIGINT) AS vocab_size,
      |  CAST(MIN_BY(cum, rk) AS BIGINT) AS covered_tokens,
      |  CAST(MAX(n) AS BIGINT) AS total_tokens
      |FROM ordered CROSS JOIN total JOIN th ON cum*100 >= n*t
      |GROUP BY t""".stripMargin

  // ------------------------------------------------------------------
  // q123: exact heavy hitters via Misra–Gries pre-screen — see
  // operators/HeavyHitters.scala for the sketch-then-exact-confirm
  // plan and the superset proof. denom=64 ⇒ tokens holding a strict
  // > 1/64 share of all occurrences, exactly.
  // ------------------------------------------------------------------
  def q123HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.frequentTokens(
      Tables.documents(spark, dir), "text", denom = 64)

  val q123Sql: String =
    """WITH tok AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      |counts AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
      |total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts)
      |SELECT w, CAST(c AS BIGINT) AS c
      |FROM counts CROSS JOIN total WHERE c*64 > n""".stripMargin

  // ------------------------------------------------------------------
  // q169: Unicode canonicalization — NFC-normalize + zero-width scrub,
  // the stage that must run BEFORE any content hashing (decomposed
  // accents and invisible characters put visually-identical texts into
  // different dedup classes). To exercise real composition on the
  // ASCII corpus, both engines decorate the text identically first
  // (every 'e' → 'e'+U+0301 combining acute, every space gains a
  // U+200B zero-width space); the Spark side then runs the compiled
  // JDK-Normalizer kernel (UnicodeNormalizeExpression) while DuckDB
  // runs utf8proc's independent nfc_normalize — two implementations of
  // UAX#15 must agree byte-for-byte (md5 over UTF-8) per document.
  // Zero-shuffle per-row kernel; the only exchange is the final check
  // ordering (none — per-doc rows).
  // ------------------------------------------------------------------
  def q169UnicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.UnicodeFunctions
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 300)
    val decorated = docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), "e", "e\u0301"),
        " ", " \u200B").as("dec"))
    decorated.select(col("doc_id"), col("dec"),
        UnicodeFunctions.nfcNormalize(col("dec"), stripZeroWidth = true)
          .as("clean"))
      .select(col("doc_id"),
        length(col("dec")).as("n_before"),
        length(col("clean")).as("n_after"),
        (length(col("clean")) -
          length(regexp_replace(col("clean"), "\u00E9", ""))).as("n_accented"),
        md5(col("clean")).as("clean_md5"))
  }

  // ------------------------------------------------------------------
  // q176: corpus datasheet ("Datasheets for Datasets", Gebru 2018 —
  // the summary card a released corpus ships with): per (lang, source)
  // with ROLLUP subtotals — document counts, token volume, distinct
  // content classes, and exact-duplicate rate in integer permille.
  // One rollup aggregate; countDistinct(text) is the only wide state
  // and is partial-aggregated per group.
  // ------------------------------------------------------------------
  def q176CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("toks"), col("text"))
    docs.rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        countDistinct(col("text")).as("n_distinct"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("n_distinct"),
        expr("(n_docs - n_distinct) * 1000 div n_docs").as("dup_pm"))
  }

  val q176Sql: String =
    """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
      |  CAST((COUNT(*) - COUNT(DISTINCT text)) * 1000 // COUNT(*) AS BIGINT)
      |    AS dup_pm
      |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin

  // ------------------------------------------------------------------
  // q175: HTML → text extraction ([[graft.functions.HtmlExpressions]]
  // state-machine kernel) — tags dropped, script/style/comment bodies
  // elided whole, entities (named + generic numeric) decoded. Both
  // engines wrap each doc in the SAME synthetic page — whose script
  // body deliberately contains a bare `<` and an entity, the case a
  // naive strip-tags regex corrupts — then Spark extracts with the
  // one-pass state machine while DuckDB uses an independent carefully-
  // ORDERED regex chain (scripts/styles first, then comments, then
  // tags, then entities, `&amp;` last). Byte-exact md5 parity per doc.
  // Zero-shuffle per-row kernel.
  // ------------------------------------------------------------------
  def q175HtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HtmlFunctions
    val pre = lit("<html><head><title>T</title><style>.x{a:b}</style>" +
      "<script>if(1<2){x=\"&amp;\"}</script></head><body><p>")
    val post = lit("</p><!-- c --><p>A &amp; B &lt;i&gt; &quot;q&quot; " +
      "&#65;&#x42;</p></body></html>")
    Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        HtmlFunctions.htmlText(concat(pre,
          regexp_replace(col("text"), "e", "&#101;"), post)).as("clean"))
      .select(col("doc_id"),
        length(col("clean")).as("n_chars"),
        (length(col("clean")) -
          length(regexp_replace(col("clean"), "<", ""))).as("n_angle"),
        md5(col("clean")).as("clean_md5"))
  }

  val q175Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>T</title><style>.x{a:b}</style>' ||
      |    '<script>if(1<2){x="&amp;"}</script></head><body><p>' ||
      |    replace(text, 'e', '&#101;') ||
      |    '</p><!-- c --><p>A &amp; B &lt;i&gt; &quot;q&quot; ' ||
      |    '&#65;&#x42;</p></body></html>' AS page
      |  FROM documents WHERE doc_id < 300),
      |stripped AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(page, '<script.*?</script>', '', 'gs'),
      |          '<style.*?</style>', '', 'gs'),
      |        '<!--.*?-->', '', 'gs'),
      |      '<[^>]*>', '', 'g') AS t
      |  FROM h),
      |clean AS (
      |  SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(replace(t,
      |      '&#101;', 'e'), '&#65;', 'A'), '&#x42;', 'B'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |      '&amp;', '&') AS c
      |  FROM stripped)
      |SELECT doc_id, CAST(length(c) AS INT) AS n_chars,
      |  CAST(length(c) - length(replace(c, '<', '')) AS INT) AS n_angle,
      |  md5(c) AS clean_md5
      |FROM clean""".stripMargin

  // ------------------------------------------------------------------
  // q182: Unicode script-mix profiling — the confusable/homoglyph spam
  // signal (mixed Latin+Cyrillic inside one document is the classic
  // phishing/SEO-spam fingerprint; script dominance also backs
  // language-ID sanity checks). Both engines decorate the same docs
  // with Cyrillic 'а' (U+0430) and Greek 'ο' (U+03BF) homoglyphs, then
  // count per-script codepoints via the SAME length-difference formula
  // (len(t) − len(regexp_replace(t, class, ''))) so the count never
  // depends on engine-specific regexp_count semantics. Zero-shuffle
  // per-row kernel; at scale this is a pure map stage.
  // ------------------------------------------------------------------
  def q182ScriptMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 300)
    val decorated = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
          regexp_replace(col("text"), "a", "а"))
        .otherwise(col("text")).as("t0"))
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
            regexp_replace(col("t0"), "o", "ο"))
          .otherwise(col("t0")).as("t"))
    def scriptCount(cls: String): org.apache.spark.sql.Column =
      (length(col("t")) - length(regexp_replace(col("t"), cls, ""))).cast(LongType)
    decorated.select(col("doc_id"),
        scriptCount("[A-Za-z]").as("n_latin"),
        scriptCount("[Ѐ-ӿ]").as("n_cyrillic"),
        scriptCount("[Ͱ-Ͽ]").as("n_greek"))
      .select(col("doc_id"), col("n_latin"), col("n_cyrillic"), col("n_greek"),
        when(col("n_latin") >= col("n_cyrillic") &&
             col("n_latin") >= col("n_greek"), "latin")
          .when(col("n_cyrillic") >= col("n_greek"), "cyrillic")
          .otherwise(lit("greek")).as("dominant"),
        (col("n_latin") > 0 &&
          (col("n_cyrillic") > 0 || col("n_greek") > 0)).as("confusable"))
  }

  val q182Sql: String =
    """WITH dec AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN replace(t0, 'o', 'ο') ELSE t0 END AS t
      |  FROM (SELECT doc_id,
      |      CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'а') ELSE text END AS t0
      |    FROM documents WHERE doc_id < 300)),
      |counts AS (
      |  SELECT doc_id,
      |    CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
      |    CAST(length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS n_cyrillic,
      |    CAST(length(t) - length(regexp_replace(t, '[Ͱ-Ͽ]', '', 'g')) AS BIGINT) AS n_greek
      |  FROM dec)
      |SELECT doc_id, n_latin, n_cyrillic, n_greek,
      |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek THEN 'latin'
      |       WHEN n_cyrillic >= n_greek THEN 'cyrillic'
      |       ELSE 'greek' END AS dominant,
      |  n_latin > 0 AND (n_cyrillic > 0 OR n_greek > 0) AS confusable
      |FROM counts""".stripMargin

  // ------------------------------------------------------------------
  // q217: Otsu adaptive quality threshold (Otsu 1979) — instead of a
  // hand-picked cutoff on a quality score (q64's fixed rules, q140's
  // fixed perplexity buckets), derive the threshold FROM the corpus:
  // the score is the type-token ratio in permille (vocabulary richness
  // — boilerplate/templated text scores low), binned to 64 cells, and
  // Otsu picks the bin boundary maximizing between-class variance
  // σ²B(t) = w0·w1·(μ0−μ1)². All-integer argmax: with S = Σ bin·cnt,
  // N = Σ cnt, and prefix sums (cum_n, cum_s), the comparison key is
  // (cum_s·N − S·cum_n)² div (cum_n·(N−cum_n)) — exact integral
  // division in both engines (numerator through DECIMAL(38,0));
  // tie → lowest bin.
  //
  // Scale shape: ONE map-side-combined 64-cell histogram is the only
  // corpus shuffle; the prefix-sum window and argmax run on the
  // 64-row bin dimension. At extreme N (where (62·N²/4)² nears 38
  // digits) divide the histogram counts by their GCD first — the
  // argmax is scale-invariant in the counts.
  // ------------------------------------------------------------------
  def q217OtsuThreshold(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // integer TTR permille, binned by 16 → 0..62 (div, never float /)
    val bin = expr(
      "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000 " +
        "div greatest(CAST(size(split(text, ' ')) AS BIGINT), 1) div 16")
    val hist = docs
      .select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // 64-row dimension: totals + prefix sums read it
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("bin")).rowsBetween(W.unboundedPreceding, W.currentRow)
    val tot = hist.agg(sum(col("cnt")).as("n"),
      sum(col("bin") * col("cnt")).as("s"))
    val cum = hist
      .withColumn("cum_n", sum(col("cnt")).over(w))
      .withColumn("cum_s", sum(col("bin") * col("cnt")).over(w))
    val scored = cum.crossJoin(broadcast(tot))
      .filter(col("cum_n") > 0 && col("cum_n") < col("n")) // both classes live
      // the products reach 62·N² — past ~3.8e8 docs that wraps a Long
      // silently in non-ANSI Spark, so the operands go DECIMAL(38,0)
      // BEFORE multiplying (the SQL side's HUGEINT does the same)
      .withColumn("a",
        col("cum_s").cast("decimal(38,0)") * col("n").cast("decimal(38,0)") -
          col("s").cast("decimal(38,0)") * col("cum_n").cast("decimal(38,0)"))
      .withColumn("key",
        expr("CAST(a AS DECIMAL(38,0)) * CAST(a AS DECIMAL(38,0)) " +
          "div (cum_n * (n - cum_n))"))
    scored.orderBy(col("key").desc, col("bin").asc).limit(1)
      .select(col("bin").as("threshold_bin"),
        col("key").cast(LongType).as("between_var_key"),
        col("cum_n").as("n_below"),
        (col("n") - col("cum_n")).as("n_above"),
        col("cum_s").as("bin_sum_below"),
        (col("s") - col("cum_s")).as("bin_sum_above"))
  }

  val q217Sql: String =
    """WITH sc AS (
      |  SELECT CAST(len(list_distinct(string_split(text, ' '))) * 1000
      |      // GREATEST(len(string_split(text, ' ')), 1) AS BIGINT) AS s
      |  FROM documents),
      |hist AS (
      |  SELECT s // 16 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM sc GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |  CAST(SUM(bin * cnt) AS BIGINT) AS s FROM hist),
      |cum AS (
      |  SELECT bin, cnt,
      |    CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
      |    CAST(SUM(bin * cnt) OVER (ORDER BY bin) AS BIGINT) AS cum_s
      |  FROM hist),
      |scored AS (
      |  SELECT bin, cum_n, cum_s, n, s,
      |    CAST(cum_s AS HUGEINT) * n - CAST(s AS HUGEINT) * cum_n AS a
      |  FROM cum CROSS JOIN tot
      |  WHERE cum_n > 0 AND cum_n < n)
      |SELECT CAST(bin AS BIGINT) AS threshold_bin,
      |  CAST(a * a // (cum_n * (n - cum_n)) AS BIGINT) AS between_var_key,
      |  cum_n AS n_below, n - cum_n AS n_above,
      |  cum_s AS bin_sum_below, s - cum_s AS bin_sum_above
      |FROM scored
      |ORDER BY a * a // (cum_n * (n - cum_n)) DESC, bin ASC
      |LIMIT 1""".stripMargin

  val q169Sql: String =
    """WITH dec AS (
      |  SELECT doc_id,
      |    replace(replace(text, 'e', 'e' || chr(769)), ' ', ' ' || chr(8203)) AS dec
      |  FROM documents WHERE doc_id < 300),
      |n AS (
      |  SELECT doc_id, dec,
      |    replace(nfc_normalize(dec), chr(8203), '') AS clean
      |  FROM dec)
      |SELECT doc_id, CAST(length(dec) AS INT) AS n_before,
      |  CAST(length(clean) AS INT) AS n_after,
      |  CAST(length(clean) - length(replace(clean, chr(233), '')) AS INT)
      |    AS n_accented,
      |  md5(clean) AS clean_md5
      |FROM n""".stripMargin

  // ------------------------------------------------------------------
  // q226: quality-rule ablation matrix — which of q64's Gopher rules
  // does the filtering WORK? Per (lang, rule): docs/tokens failing the
  // rule, and docs/tokens the rule ALONE removes (fails it, passes the
  // other three) — the marginal mass you'd recover by dropping that
  // rule. This is the triage every curation pipeline runs before
  // tightening or relaxing a filter: a rule with large fail mass but
  // near-zero sole-blocker mass is redundant; a rule with large
  // sole-blocker mass is the binding constraint.
  //
  // Scale shape: identical to q64 — all four rules are per-row integer
  // kernels (the compiled top-word counter included), ONE lang shuffle
  // carrying 16 partial sums, then a 4-row-per-lang stack of the
  // aggregated frame (post-agg, so the explode multiplies langs, not
  // docs). Zero additional corpus passes over q64.
  // ------------------------------------------------------------------
  def q226RuleAblation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nWords = size(split(col("text"), " ")).cast(LongType)
    val nWordChars = (length(col("text")) - (nWords - 1)).cast(LongType)
    val padded = concat(lit(" "), col("text"), lit(" "))
    val nStop = Seq("the", "a", "and", "of")
      .map(w => when(padded.contains(s" $w "), 1L).otherwise(0L))
      .reduce(_ + _)
    val topCount = TextHashFunctions.topWordCount(col("text")).cast(LongType)
    val scored = docs.select(col("lang"), nWords.as("toks"),
      (nWords >= 50).as("r1"),
      (nWordChars >= nWords * 3 && nWordChars <= nWords * 10).as("r2"),
      (nStop >= 2).as("r3"),
      (topCount * 5 <= nWords).as("r4"))
    val rules = Seq("r1", "r2", "r3", "r4")
    val aggs = rules.flatMap { r =>
      val fail = !col(r)
      val sole = fail && rules.filterNot(_ == r).map(col).reduce(_ && _)
      Seq(
        sum(when(fail, 1L).otherwise(0L)).as(s"${r}_fail_docs"),
        sum(when(fail, col("toks")).otherwise(0L)).as(s"${r}_fail_tokens"),
        sum(when(sole, 1L).otherwise(0L)).as(s"${r}_sole_docs"),
        sum(when(sole, col("toks")).otherwise(0L)).as(s"${r}_sole_tokens"))
    }
    val names = Map("r1" -> "wordcount", "r2" -> "meanlen",
      "r3" -> "stopwords", "r4" -> "topword")
    val stackArgs = rules.map { r =>
      s"'${names(r)}', ${r}_fail_docs, ${r}_fail_tokens, " +
        s"${r}_sole_docs, ${r}_sole_tokens"
    }.mkString(", ")
    scored.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
      .select(col("lang"), expr(s"stack(4, $stackArgs) AS " +
        "(rule, fail_docs, fail_tokens, sole_docs, sole_tokens)"))
      .orderBy(col("lang"), col("rule"))
  }

  val q226Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
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
      |  SELECT b.lang, b.toks,
      |    b.toks >= 50 AS r1,
      |    b.n_word_chars >= b.toks * 3 AND b.n_word_chars <= b.toks * 10 AS r2,
      |    b.n_stop >= 2 AS r3,
      |    t.top_count * 5 <= b.toks AS r4
      |  FROM base b JOIN top t USING (doc_id)),
      |m AS (
      |  SELECT lang, rule,
      |    CASE rule
      |      WHEN 'wordcount' THEN NOT r1
      |      WHEN 'meanlen' THEN NOT r2
      |      WHEN 'stopwords' THEN NOT r3
      |      ELSE NOT r4 END AS fail,
      |    CASE rule
      |      WHEN 'wordcount' THEN NOT r1 AND r2 AND r3 AND r4
      |      WHEN 'meanlen' THEN r1 AND NOT r2 AND r3 AND r4
      |      WHEN 'stopwords' THEN r1 AND r2 AND NOT r3 AND r4
      |      ELSE r1 AND r2 AND r3 AND NOT r4 END AS sole,
      |    toks
      |  FROM scored CROSS JOIN (
      |    SELECT unnest(['wordcount', 'meanlen', 'stopwords', 'topword']) AS rule))
      |SELECT lang, rule,
      |  CAST(SUM(CASE WHEN fail THEN 1 ELSE 0 END) AS BIGINT) AS fail_docs,
      |  CAST(SUM(CASE WHEN fail THEN toks ELSE 0 END) AS BIGINT) AS fail_tokens,
      |  CAST(SUM(CASE WHEN sole THEN 1 ELSE 0 END) AS BIGINT) AS sole_docs,
      |  CAST(SUM(CASE WHEN sole THEN toks ELSE 0 END) AS BIGINT) AS sole_tokens
      |FROM m
      |GROUP BY lang, rule
      |ORDER BY lang, rule""".stripMargin

  // ------------------------------------------------------------------
  // q234: readability profile per source (Flesch reading-ease +
  // Flesch–Kincaid grade, Kincaid et al. 1975). The counts are the
  // classic deterministic heuristics: words = space-split tokens,
  // sentences = max(1, count of [.!?] characters), syllables = vowel
  // runs [aeiouy]+ per lowercased token with a floor of 1. The pooled
  // score (computed from corpus-total counts, not a mean of per-doc
  // scores) is the stable per-source number; the per-doc FK grade only
  // feeds the easy/medium/hard band tallies.
  //
  // Float parity: every count is exact integer arithmetic per row; the
  // two pooled scores are ONE identically-structured double expression
  // over the exact sums, rounded 4 dp. Band cuts compare per-doc
  // doubles built from exact integers with the same expression shape
  // in both engines (IEEE evaluation is bit-identical).
  //
  // Scale shape: zero-shuffle per-row kernels (split/regexp/array fold
  // — all codegen'd builtins) into ONE map-side-combined source tally,
  // then the final order range. No explode: syllables come out of an
  // `aggregate` fold over the token array, so the hot path never
  // multiplies rows by tokens.
  // ------------------------------------------------------------------
  def q234Readability(spark: SparkSession, dir: String): DataFrame = {
    // compiled one-scan counts (ReadabilityCountsExpression): the
    // declarative dual (regexp_replace + per-token regexp_extract_all
    // through interpreted HOFs) walked the text three times and ran 3×
    // slower at the 10× scale; parity is contractual (see the kernel's
    // Scaladoc) and the oracle recomputes the declarative form
    val r = graft.functions.TextHashFunctions.readabilityCounts(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("source"), r.as("r"))
      .select(col("source"), col("r.w").as("w"), col("r.s").as("s"),
        col("r.syl").as("syl"))
      .withColumn("fk",
        lit(0.39) * (col("w").cast(DoubleType) / col("s").cast(DoubleType)) +
          lit(11.8) * (col("syl").cast(DoubleType) / col("w").cast(DoubleType)) -
          lit(15.59))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_words"),
        sum(col("s")).as("total_sentences"),
        sum(col("syl")).as("total_syllables"),
        sum(when(col("fk") < 8.0, 1L).otherwise(0L)).as("n_easy"),
        sum(when(col("fk") >= 8.0 && col("fk") <= 12.0, 1L).otherwise(0L))
          .as("n_medium"),
        sum(when(col("fk") > 12.0, 1L).otherwise(0L)).as("n_hard"))
      .withColumn("fre_pooled", round(
        lit(206.835) -
          lit(1.015) * (col("total_words").cast(DoubleType) /
            col("total_sentences").cast(DoubleType)) -
          lit(84.6) * (col("total_syllables").cast(DoubleType) /
            col("total_words").cast(DoubleType)), 4))
      .withColumn("fk_pooled", round(
        lit(0.39) * (col("total_words").cast(DoubleType) /
          col("total_sentences").cast(DoubleType)) +
          lit(11.8) * (col("total_syllables").cast(DoubleType) /
            col("total_words").cast(DoubleType)) -
          lit(15.59), 4))
      .select(col("source"), col("n_docs"), col("total_words"),
        col("total_sentences"), col("total_syllables"),
        col("fre_pooled"), col("fk_pooled"),
        col("n_easy"), col("n_medium"), col("n_hard"))
      .orderBy(col("source"))
  }

  val q234Sql: String =
    """WITH base AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |    greatest(CAST(1 AS BIGINT),
      |      CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) AS BIGINT)) AS s,
      |    CAST(list_sum(list_transform(string_split(lower(text), ' '),
      |      t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+')))))
      |      AS BIGINT) AS syl
      |  FROM documents),
      |scored AS (
      |  SELECT source, w, s, syl,
      |    0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)) +
      |      11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) - 15.59 AS fk
      |  FROM base)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(w) AS BIGINT) AS total_words,
      |  CAST(SUM(s) AS BIGINT) AS total_sentences,
      |  CAST(SUM(syl) AS BIGINT) AS total_syllables,
      |  round(206.835 -
      |    1.015 * (CAST(SUM(w) AS DOUBLE) / CAST(SUM(s) AS DOUBLE)) -
      |    84.6 * (CAST(SUM(syl) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)), 4)
      |    AS fre_pooled,
      |  round(0.39 * (CAST(SUM(w) AS DOUBLE) / CAST(SUM(s) AS DOUBLE)) +
      |    11.8 * (CAST(SUM(syl) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)) - 15.59, 4)
      |    AS fk_pooled,
      |  CAST(SUM(CASE WHEN fk < 8.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy,
      |  CAST(SUM(CASE WHEN fk >= 8.0 AND fk <= 12.0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_medium,
      |  CAST(SUM(CASE WHEN fk > 12.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
      |FROM scored GROUP BY source
      |ORDER BY source""".stripMargin
}
