package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Ranked retrieval and model-based scoring over the corpus — the layer a
 * training-data pipeline runs AFTER indexing (q85/q108 built postings;
 * these queries RANK with them): BM25 top-k retrieval, CCNet-style
 * n-gram-LM perplexity bucketing (Wenzek et al. 2020), weighted
 * priority sampling (Efraimidis & Spirakis 2006 exponential clocks),
 * and UniMax budget-capped mixture allocation (Chung et al. 2023).
 *
 * Parity design (suite convention, see PretrainQueries header): integer
 * arithmetic wherever possible; ln/log2 addends rounded to 6 dp BEFORE
 * any sum; final floats rounded to 4 dp; every ordering sorts on the
 * ROUNDED value with an integer tiebreak.
 */
object RetrievalQueries {

  // fixed retrieval workload over the synthetic vocabulary — a literal
  // dimension table, exactly the shape of a production query log join
  private val QueryTerms: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "query", 1L -> "plan",
    2L -> "hash", 2L -> "join", 2L -> "table",
    3L -> "window", 3L -> "agg", 3L -> "row",
    4L -> "slow", 4L -> "scan", 4L -> "filter",
    5L -> "customer", 5L -> "order", 5L -> "value")

  // ------------------------------------------------------------------
  // q139: BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene's
  // idf = ln(1 + (N - df + ½)/(df + ½)) so scores stay positive).
  // Scale shape: the query-term table is broadcast into the term-
  // frequency scan, so corpus-sized work is ∝ the POSTINGS OF THE
  // QUERY TERMS, never the corpus; per-query top-k runs through the
  // bounded-heap TopKAggregate (map-side k rows per partition — the
  // window/row_number dual would shuffle every candidate). One-row
  // corpus stats (N, avgdl) ride a broadcast cross join.
  // k1 = 1.2, b = 0.75 (the standard defaults).
  // ------------------------------------------------------------------
  def q139Bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qterms = QueryTerms.toDF("qid", "term")
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint() // read by the 1-row stats agg AND the score join
    val stats = dl.agg(count(lit(1)).as("n"),
      avg(col("dl").cast(DoubleType)).as("avgdl"))
    // postings restricted to query terms BEFORE any wide operation
    val tfq = words.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // read by the df agg AND the contribution join
    val idf = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        round(log(lit(1.0) + (col("n").cast(DoubleType) - col("df").cast(DoubleType) + 0.5)
          / (col("df").cast(DoubleType) + 0.5)), 6).as("idf"))
    // contribution in exact integer MICROS: one float expression, one
    // round-to-integer — partial-aggregate sums are then exact longs,
    // immune to summation order (a 4-dp boundary flipped on the double
    // path; see q140's identical fix)
    val contrib = broadcast(qterms).join(tfq, "term")
      .join(broadcast(idf), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats.select("avgdl")))
      .select(col("qid"), col("doc_id"),
        round(col("idf") * (col("tf").cast(DoubleType) * 2.2)
          / (col("tf").cast(DoubleType)
            + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) / col("avgdl")))
          * 1000000.0).cast(LongType)
          .as("c"))
    // round-half-up to 4 dp IN INTEGERS: score = S/10^6, so the 4-dp
    // value is round(S/100) ten-thousandths = (2S + 100) div 200 —
    // micro-sums are ratios of small integers and DO land exactly on
    // .00005 boundaries, where Spark's BigDecimal round and DuckDB's
    // float-multiply round disagree (bit-for-bit divergence seen at
    // sf0.001 in q140). The only float op left is one division by 10^4.
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(expr("(2 * sum(c) + 100) div 200").as("s4"))
      .select(col("qid"), col("doc_id"),
        (col("s4").cast(DoubleType) / 10000.0).as("score"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAggregate.topK(col("score"), col("doc_id"), 5).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("qid"), (col("p") + 1).cast(LongType).as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("score"))
  }

  val q139Sql: String = {
    val vals = QueryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q(qid, term) AS (VALUES $vals),
      |words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |dl AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      |  FROM words WHERE term <> '' GROUP BY doc_id),
      |stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      |tf AS (
      |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM words WHERE term IN (SELECT DISTINCT term FROM q)
      |  GROUP BY term, doc_id),
      |idf AS (
      |  SELECT term, round(ln(1.0 + (CAST(s.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5)), 6) AS idf
      |  FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
      |  CROSS JOIN stats s),
      |contrib AS (
      |  SELECT q.qid, tf.doc_id,
      |    CAST(round(idf.idf * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE)
      |        + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
      |      * 1000000.0) AS BIGINT) AS c
      |  FROM q JOIN tf USING (term) JOIN idf USING (term)
      |  JOIN dl USING (doc_id) CROSS JOIN stats s),
      |scores AS (
      |  SELECT qid, doc_id,
      |    CAST((2 * SUM(c) + 100) // 200 AS DOUBLE) / 10000.0 AS score
      |  FROM contrib GROUP BY qid, doc_id),
      |ranked AS (
      |  SELECT qid, doc_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |  FROM scores)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rank, doc_id, score
      |FROM ranked WHERE rnk <= 5""".stripMargin
  }

  // ------------------------------------------------------------------
  // q140: CCNet-style LM perplexity bucketing (Wenzek et al. 2020 —
  // the head/middle/tail split LLaMA's corpus used). A word-BIGRAM
  // add-one model is trained on a curated slice (src0-src2 stand in
  // for the reference's Wikipedia), every document is scored by mean
  // bits-per-bigram, and each source is split into perplexity tertiles.
  // Scale shape: the LM table is vocabulary-sized (distinct ref
  // bigrams), broadcast onto a zero-shuffle per-row bigram expansion
  // (array transform, not posexplode+self-join); the only corpus-sized
  // exchanges are the per-doc score aggregation and the per-source
  // tertile window. Unseen bigram → add-one backoff c2=0; unseen
  // history word → uniform 1/V. Addends round 6 dp; score 4 dp;
  // tertile ranks on (rounded score, doc_id).
  // ------------------------------------------------------------------
  def q140PerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
    val refWords = docs.filter(col("source").isin("src0", "src1", "src2"))
      .select(col("ws"))
    val uni = refWords.select(explode(col("ws")).as("w1"))
      .filter(col("w1") =!= "")
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // V as a 1-row broadcast (vocabulary size for add-one smoothing)
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigramsOf = (c: org.apache.spark.sql.Column) =>
      explode(expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), (x, i) -> struct(x as w1, ws[i + 1] as w2))"))
    val bi = refWords.select(bigramsOf(col("ws")).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val scored = docs
      .select(col("doc_id"), col("source"), bigramsOf(col("ws")).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1"), col("b.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      // bits in exact integer MICROS: long partial sums are immune to
      // float summation order (a 4-dp rounding boundary flipped between
      // engines on the double path at sf0.001)
      .select(col("doc_id"), col("source"),
        round(-log2((coalesce(col("c2"), lit(0L)).cast(DoubleType) + 1.0)
          / (coalesce(col("c1"), lit(0L)).cast(DoubleType) + col("v").cast(DoubleType)))
          * 1000000.0).cast(LongType)
          .as("bits"))
      // round-half-up to 4 dp IN INTEGERS (q139's convention): the mean
      // is S/(n·10^6); its ten-thousandths value is (2S + 100n) div 200n.
      // Micro-sums are ratios of small integers and land exactly on
      // .00005 boundaries, where Spark's BigDecimal round and DuckDB's
      // float-multiply round disagree — observed at sf0.001 (5.15415).
      .groupBy(col("doc_id"), col("source"))
      .agg(expr("(2 * sum(bits) + 100 * count(1)) div (200 * count(1))").as("p4"))
    scored
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy(col("source"))
          .orderBy(col("p4"), col("doc_id"))).cast(LongType))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        expr("(2 * sum(p4) + count(1)) div (2 * count(1))").as("a4"))
      .select(col("source"), col("bucket"), col("n_docs"),
        (col("a4").cast(DoubleType) / 10000.0).as("avg_bits"))
  }

  val q140Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |ref AS (SELECT ws FROM docs WHERE source IN ('src0', 'src1', 'src2')),
      |uni AS (
      |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM (SELECT unnest(ws) AS w1 FROM ref) u
      |  WHERE w1 <> '' GROUP BY w1),
      |vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      |bi AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
      |    SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
      |           unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      |    FROM ref) b
      |  WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
      |doc_bi AS (
      |  SELECT doc_id, source,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
      |    unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      |  FROM docs),
      |scored AS (
      |  SELECT d.doc_id, d.source,
      |    (2 * SUM(CAST(round(-log2((CAST(COALESCE(bi.c2, 0) AS DOUBLE) + 1.0)
      |        / (CAST(COALESCE(uni.c1, 0) AS DOUBLE)
      |          + CAST((SELECT v FROM vocab) AS DOUBLE)))
      |        * 1000000.0) AS BIGINT))
      |      + 100 * COUNT(*)) // (200 * COUNT(*)) AS p4
      |  FROM doc_bi d
      |  LEFT JOIN bi ON bi.w1 = d.w1 AND bi.w2 = d.w2
      |  LEFT JOIN uni ON uni.w1 = d.w1
      |  WHERE d.w1 <> '' AND d.w2 <> ''
      |  GROUP BY d.doc_id, d.source),
      |bucketed AS (
      |  SELECT source, doc_id, p4,
      |    CAST(ntile(3) OVER (PARTITION BY source
      |      ORDER BY p4, doc_id) AS BIGINT) AS bucket
      |  FROM scored)
      |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST((2 * SUM(p4) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000.0 AS avg_bits
      |FROM bucketed GROUP BY source, bucket""".stripMargin

  // ------------------------------------------------------------------
  // q141: weighted priority sampling — k docs per source, inclusion
  // probability ∝ n_chars, WITHOUT replacement and WITHOUT a global
  // sort (Efraimidis & Spirakis 2006: exponential clock key
  // ln(1/u)/w; the k SMALLEST keys per group are the sample). The
  // uniform u is a Knuth multiplicative hash of doc_id — exact integer
  // arithmetic, partition-independent, identical in both engines —
  // mapped into (0,1) by one division. The k-smallest runs through the
  // bounded-heap TopKAggregate (negated key), so each partition
  // forwards ≤ k rows per source: the reservoir shape that holds when
  // one source spans thousands of partitions.
  // ------------------------------------------------------------------
  def q141WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      // h in [0, 2^24): exact in both engines; u = (h+1)/(2^24+1) ∈ (0,1)
      .withColumn("h", (col("doc_id") * 2654435761L) % 16777216L)
      .withColumn("key",
        round(-round(log((col("h").cast(DoubleType) + 1.0) / 16777217.0), 6)
          / col("n_chars").cast(DoubleType), 9))
    docs.groupBy(col("source"))
      .agg(graft.functions.TopKAggregate.topK(-col("key"), col("doc_id"), 5).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("source"), (col("p") + 1).cast(LongType).as("rank"),
        col("e.id").as("doc_id"), round(-col("e.score"), 9).as("key"))
  }

  val q141Sql: String =
    """WITH keyed AS (
      |  SELECT source, doc_id,
      |    round(-round(ln((CAST((doc_id * 2654435761) % 16777216 AS DOUBLE) + 1.0)
      |        / 16777217.0), 6)
      |      / CAST(n_chars AS DOUBLE), 9) AS key
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, key,
      |    row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rnk
      |  FROM keyed)
      |SELECT source, CAST(rnk AS BIGINT) AS rank, doc_id, round(key, 9) AS key
      |FROM ranked WHERE rnk <= 5""".stripMargin

  // ------------------------------------------------------------------
  // q142: UniMax mixture allocation (Chung et al. 2023) — distribute a
  // total character budget B across sources with a hard per-source
  // repeat cap E, maximizing uniformity: smallest sources are taken in
  // full up to E epochs, the rest split the remaining budget equally
  // (waterfilling). Closed form over the ascending capacity order:
  // source k is CAPPED iff cap_k · (n−k+1) ≤ B − prefixcap_{k−1} —
  // an ALL-INTEGER predicate (no float waterlevel search), so both
  // engines agree bit-for-bit; the shared level for uncapped sources
  // is the single final division. The whole query is dimension-sized
  // (one row per source) after one corpus aggregation.
  // B = 3/5 of total corpus chars, E = 4 epochs.
  // ------------------------------------------------------------------
  def q142UnimaxAllocation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcs = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("sz"))
      .withColumn("cap", col("sz") * 4L)
    val budget = srcs.agg(expr("cast((sum(sz) * 3) div 5 as bigint)").as("b"))
    val w = Window.orderBy(col("cap"), col("source"))
    val ranked = srcs.crossJoin(broadcast(budget))
      .withColumn("k", row_number().over(w).cast(LongType))
      .withColumn("pre", coalesce(sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast(LongType))
      .withColumn("capped", col("cap") * (col("m") - col("k") + 1L)
        <= col("b") - col("pre"))
    val lastCapped = ranked.agg(
      max(when(col("capped"), col("k")).otherwise(lit(0L))).as("kstar"),
      max(when(col("capped"), col("pre") + col("cap")).otherwise(lit(0L))).as("scap"),
      first(col("m")).as("mm"), first(col("b")).as("bb"))
    ranked.crossJoin(broadcast(lastCapped))
      .withColumn("alloc",
        when(col("capped"), col("cap").cast(DoubleType))
          .otherwise((col("bb") - col("scap")).cast(DoubleType)
            / (col("mm") - col("kstar")).cast(DoubleType)))
      .select(col("source"), col("sz"), col("cap"), col("capped"),
        round(col("alloc"), 4).as("alloc_chars"),
        round(col("alloc") / col("sz").cast(DoubleType), 4).as("epochs"))
  }

  val q142Sql: String =
    """WITH srcs AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sz,
      |    CAST(SUM(n_chars) * 4 AS BIGINT) AS cap
      |  FROM documents GROUP BY source),
      |budget AS (
      |  SELECT CAST(SUM(sz) * 3 // 5 AS BIGINT) AS b FROM srcs),
      |ranked AS (
      |  SELECT source, sz, cap, (SELECT b FROM budget) AS b,
      |    CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS k,
      |    CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS m
      |  FROM srcs),
      |flagged AS (
      |  SELECT *, cap * (m - k + 1) <= b - pre AS capped FROM ranked),
      |lvl AS (
      |  SELECT MAX(CASE WHEN capped THEN k ELSE 0 END) AS kstar,
      |    MAX(CASE WHEN capped THEN pre + cap ELSE 0 END) AS scap,
      |    ANY_VALUE(m) AS mm, ANY_VALUE(b) AS bb
      |  FROM flagged)
      |SELECT f.source, f.sz, f.cap, f.capped,
      |  round(CASE WHEN f.capped THEN CAST(f.cap AS DOUBLE)
      |    ELSE CAST(l.bb - l.scap AS DOUBLE) / CAST(l.mm - l.kstar AS DOUBLE)
      |  END, 4) AS alloc_chars,
      |  round(CASE WHEN f.capped THEN CAST(f.cap AS DOUBLE)
      |    ELSE CAST(l.bb - l.scap AS DOUBLE) / CAST(l.mm - l.kstar AS DOUBLE)
      |  END / CAST(f.sz AS DOUBLE), 4) AS epochs
      |FROM flagged f CROSS JOIN lvl l""".stripMargin

  // ------------------------------------------------------------------
  // q170: bitext mining by ratio margin (Artetxe & Schwenk 2019 — the
  // LASER/CCMatrix parallel-corpus miner): for candidate pair (x, y)
  // across two embedding spaces, score cos(x,y) against the MEAN of
  // each side's k-nearest-neighbor sims — a hub-correction that plain
  // cosine thresholds lack. Here the two "languages" are the even/odd
  // halves of the embeddings table (the structure is identical to a
  // real src/tgt pair of encoders' outputs).
  //
  // Parity design: cos via the compiled vec_dot/vec_norm kernels,
  // rounded ONCE to integer 1e-4 units (the q35-proven tolerance);
  // everything after — top-4 sums per side, the margin ratio in
  // permille, ordering, argmax — is exact integer arithmetic. Plan:
  // the tgt half is dimension-sized and broadcasts into the src scan
  // (at corpus scale the same margin composes over `Similarity.ivfTopK`
  // blocks — brute force is the correctness anchor, q35/q126's
  // contract); the scored pair table is checkpointed once and feeds
  // the fwd window, bwd window, and final argmax.
  // ------------------------------------------------------------------
  def q170BitextMargin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions._
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < 400)
    val src = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("sv"))
    val tgt = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("embedding").as("tv"))
    val pairs = src.crossJoin(broadcast(tgt))
      .withColumn("icos",
        round(vecDot(col("sv"), col("tv")) /
          (vecNorm(col("sv")) * vecNorm(col("tv"))) * 10000).cast(LongType))
      .filter(col("icos") > 0)
      .select(col("src_id"), col("tgt_id"), col("icos"))
      .localCheckpoint()
    val fwd = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("icos").desc, col("tgt_id").asc)))
      .filter(col("rk") <= 4)
      .groupBy(col("src_id"))
      .agg(sum(col("icos")).as("sum_s"), count(lit(1)).as("cnt_s"))
    val bwd = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("tgt_id"))
          .orderBy(col("icos").desc, col("src_id").asc)))
      .filter(col("rk") <= 4)
      .groupBy(col("tgt_id"))
      .agg(sum(col("icos")).as("sum_t"), count(lit(1)).as("cnt_t"))
    pairs.join(broadcast(fwd), Seq("src_id"))
      .join(broadcast(bwd), Seq("tgt_id"))
      .withColumn("margin_pm",
        (col("icos") * 1000L * (col("cnt_s") + col("cnt_t")) /
          (col("sum_s") + col("sum_t"))).cast(LongType))
      .withColumn("pick", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin_pm").desc, col("tgt_id").asc)))
      .filter(col("pick") === 1)
      .select(col("src_id"), col("tgt_id"), col("icos"), col("margin_pm"))
  }

  val q170Sql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 400),
      |s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 2 = 0),
      |t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE vec_id % 2 = 1),
      |pairs AS (
      |  SELECT src_id, tgt_id,
      |    CAST(round(list_dot_product(sv, tv) /
      |      (sqrt(list_dot_product(sv, sv)) * sqrt(list_dot_product(tv, tv)))
      |      * 10000) AS BIGINT) AS icos
      |  FROM s CROSS JOIN t),
      |pos AS (SELECT * FROM pairs WHERE icos > 0),
      |fwd AS (
      |  SELECT src_id, CAST(SUM(icos) AS BIGINT) AS sum_s,
      |    COUNT(*) AS cnt_s FROM (
      |    SELECT src_id, icos, ROW_NUMBER() OVER (PARTITION BY src_id
      |      ORDER BY icos DESC, tgt_id ASC) AS rk FROM pos)
      |  WHERE rk <= 4 GROUP BY src_id),
      |bwd AS (
      |  SELECT tgt_id, CAST(SUM(icos) AS BIGINT) AS sum_t,
      |    COUNT(*) AS cnt_t FROM (
      |    SELECT tgt_id, icos, ROW_NUMBER() OVER (PARTITION BY tgt_id
      |      ORDER BY icos DESC, src_id ASC) AS rk FROM pos)
      |  WHERE rk <= 4 GROUP BY tgt_id),
      |scored AS (
      |  SELECT p.src_id, p.tgt_id, p.icos,
      |    CAST(p.icos * 1000 * (f.cnt_s + b.cnt_t) //
      |      (f.sum_s + b.sum_t) AS BIGINT) AS margin_pm
      |  FROM pos p JOIN fwd f USING (src_id) JOIN bwd b USING (tgt_id))
      |SELECT src_id, tgt_id, icos, margin_pm FROM scored
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id
      |  ORDER BY margin_pm DESC, tgt_id ASC) = 1""".stripMargin

  // ------------------------------------------------------------------
  // q173: retrieval-quality metrics (MRR, nDCG@5) for the q139 BM25
  // run against derivable relevance labels (doc is relevant to a query
  // iff it contains EVERY query term as a token). The rank-discount
  // weights 10⁶/log₂(r+1) are FIXED integer literals on both sides —
  // no cross-engine transcendental ever runs — so DCG/IDCG/MRR are
  // exact integer micro-unit arithmetic end to end. This is the eval
  // loop of a retrieval pipeline (run → qrels → metrics) as one plan.
  // Plan: run is q139's (already budgeted); labels are one broadcast
  // term join + per-(qid,doc) agg; everything after is query-count-
  // sized.
  // ------------------------------------------------------------------
  def q173RankingMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = q139Bm25(spark, dir) // (qid, rank, doc_id, score)
    val qt = QueryTerms.toDF("qid", "term")
    val qn = QueryTerms.groupBy(_._1)
      .map { case (q, l) => (q, l.map(_._2).distinct.size.toLong) }
      .toSeq.toDF("qid", "qn")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val rel = docs.join(broadcast(qt), array_contains(col("w"), col("term")))
      .groupBy(col("qid"), col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .join(broadcast(qn), Seq("qid"))
      .filter(col("nt") === col("qn"))
      .select(col("qid"), col("doc_id"))
      .localCheckpoint() // read by the totals agg AND the run join
    val totals = rel.groupBy(col("qid")).agg(count(lit(1)).as("total_rel"))
    val wts = Seq((1L, 1000000L), (2L, 630930L), (3L, 500000L),
      (4L, 430677L), (5L, 386853L)).toDF("rank", "wm")
    val idcg = totals.join(broadcast(wts),
        col("rank") <= least(col("total_rel"), lit(5L)))
      .groupBy(col("qid")).agg(sum(col("wm")).as("idcg"))
    val perq = run
      .join(rel.withColumn("hit", lit(1L)), Seq("qid", "doc_id"), "left_outer")
      .join(broadcast(wts), Seq("rank"))
      .select(col("qid"), col("rank"),
        coalesce(col("hit"), lit(0L)).as("r"), col("wm"))
      .groupBy(col("qid"))
      .agg(sum(col("r")).as("n_rel_top"),
        sum(col("r") * col("wm")).as("dcg"),
        min(when(col("r") === 1L, col("rank"))).as("fr"))
    perq.join(broadcast(totals), Seq("qid"), "left_outer")
      .join(broadcast(idcg), Seq("qid"), "left_outer")
      .select(col("qid"), col("n_rel_top"),
        coalesce(col("total_rel"), lit(0L)).as("total_rel"),
        coalesce(expr("1000000 div fr"), lit(0L)).as("mrr_micro"),
        when(coalesce(col("idcg"), lit(0L)) > 0L,
          expr("dcg * 1000000 div idcg")).otherwise(lit(0L)).as("ndcg_micro"))
  }

  val q173Sql: String = {
    val vals = QueryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH run AS (
      |${q139Sql}
      |),
      |q(qid, term) AS (VALUES $vals),
      |qn AS (SELECT qid, COUNT(DISTINCT term) AS qn FROM q GROUP BY qid),
      |rel AS (
      |  SELECT x.qid, x.doc_id FROM (
      |    SELECT q.qid, d.doc_id, COUNT(DISTINCT q.term) AS nt
      |    FROM documents d JOIN q
      |      ON list_contains(string_split(d.text, ' '), q.term)
      |    GROUP BY q.qid, d.doc_id) x
      |  JOIN qn USING (qid) WHERE x.nt = qn.qn),
      |totals AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS total_rel
      |  FROM rel GROUP BY qid),
      |w(rank, wm) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
      |  (4, 430677), (5, 386853)),
      |idcg AS (
      |  SELECT t.qid, CAST(SUM(w.wm) AS BIGINT) AS idcg
      |  FROM totals t JOIN w ON w.rank <= least(t.total_rel, 5)
      |  GROUP BY t.qid),
      |perq AS (
      |  SELECT r.qid,
      |    CAST(SUM(CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |      AS n_rel_top,
      |    CAST(SUM(CASE WHEN rel.doc_id IS NULL THEN 0 ELSE w.wm END) AS BIGINT)
      |      AS dcg,
      |    MIN(CASE WHEN rel.doc_id IS NOT NULL THEN r.rank END) AS fr
      |  FROM run r
      |  LEFT JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id
      |  JOIN w ON w.rank = r.rank
      |  GROUP BY r.qid)
      |SELECT CAST(p.qid AS BIGINT) AS qid, p.n_rel_top,
      |  COALESCE(t.total_rel, 0) AS total_rel,
      |  CAST(COALESCE(1000000 // p.fr, 0) AS BIGINT) AS mrr_micro,
      |  CAST(CASE WHEN COALESCE(i.idcg, 0) > 0
      |    THEN p.dcg * 1000000 // i.idcg ELSE 0 END AS BIGINT) AS ndcg_micro
      |FROM perq p
      |LEFT JOIN totals t ON t.qid = p.qid
      |LEFT JOIN idcg i ON i.qid = p.qid""".stripMargin
  }

  // ------------------------------------------------------------------
  // q174: interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
  // Chen & Goodman 1998 — the smoothing KenLM/CCNet actually run,
  // upgrading q140's add-one model). Absolute discount D = 0.75:
  //   P(w|v) = (max(c(vw)−D, 0) + D·N₁₊(v·)·Pcont(w)) / c(v·)
  //   Pcont(w) = N₁₊(·w) / N₁₊(··)      (continuation probabilities)
  // Trained on the doc_id%5≠0 shard, scores the held-out doc_id%5=0
  // shard; bigrams whose v or w never appeared in training are COUNTED
  // as skips, never fabricated (the <unk> decision made explicit).
  //
  // Parity: all five count tables are integers; P is ONE identically-
  // structured double expression in both engines; each bigram's
  // −log₂P rounds once to integer micro-bits (the q139/q140 fix), so
  // every aggregate after is exact long arithmetic. Scale shape: the
  // model is vocabulary-sized (one (v,w) tally — map-side combined —
  // plus three derived dimension aggs) and broadcasts back onto a
  // zero-shuffle bigram expansion of the scored shard; per-doc and
  // per-lang tallies are the only other exchanges.
  // ------------------------------------------------------------------
  def q174KneserNey(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
    val bigramsOf = () => explode(expr(
      "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), (x, i) -> struct(x as w1, ws[i + 1] as w2))"))
    val trainBi = docs.filter(col("doc_id") % 5 =!= 0)
      .select(bigramsOf().as("b"))
      .select(col("b.w1"), col("b.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val cnt = trainBi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cvw")).localCheckpoint() // feeds 4 derived aggs
    val cv = cnt.groupBy(col("w1")).agg(sum(col("cvw")).as("cv"),
      count(lit(1)).as("n1v"))
    val n1w = cnt.groupBy(col("w2")).agg(count(lit(1)).as("n1w"))
    val n1tot = cnt.agg(count(lit(1)).as("n1tot"))
    val scored = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"), bigramsOf().as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .join(broadcast(cnt), Seq("w1", "w2"), "left_outer")
      .join(broadcast(cv), Seq("w1"), "left_outer")
      .join(broadcast(n1w), Seq("w2"), "left_outer")
      .crossJoin(broadcast(n1tot))
    val known = col("cv").isNotNull && col("n1w").isNotNull
    val p = (greatest(coalesce(col("cvw"), lit(0L)).cast(DoubleType) - 0.75,
        lit(0.0)) +
      lit(0.75) * col("n1v").cast(DoubleType) *
        (col("n1w").cast(DoubleType) / col("n1tot").cast(DoubleType))) /
      col("cv").cast(DoubleType)
    val perDoc = scored
      .select(col("doc_id"), col("lang"),
        when(known, round(-log2(p) * 1000000.0).cast(LongType)).as("mb"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(when(col("mb").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("mb").isNull, 1L).otherwise(0L)).as("n_skipped"),
        coalesce(sum(col("mb")), lit(0L)).as("micro_bits"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_scored")).as("n_bigrams"),
        sum(col("n_skipped")).as("n_oov"),
        sum(col("micro_bits")).as("total_micro_bits"),
        expr("sum(micro_bits) div greatest(sum(n_scored), 1)")
          .as("mean_micro_bits"))
  }

  val q174Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ws
      |  FROM documents),
      |train AS (
      |  SELECT b.w1, b.w2 FROM (
      |    SELECT unnest(list_transform(range(1, len(ws)),
      |      i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
      |    FROM d WHERE doc_id % 5 <> 0)
      |  WHERE b.w1 <> '' AND b.w2 <> ''),
      |cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cvw
      |  FROM train GROUP BY w1, w2),
      |cv AS (SELECT w1, CAST(SUM(cvw) AS BIGINT) AS cv,
      |  CAST(COUNT(*) AS BIGINT) AS n1v FROM cnt GROUP BY w1),
      |n1w AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w
      |  FROM cnt GROUP BY w2),
      |n1tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1tot FROM cnt),
      |sb AS (
      |  SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM (
      |    SELECT doc_id, lang, unnest(list_transform(range(1, len(ws)),
      |      i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS b
      |    FROM d WHERE doc_id % 5 = 0)
      |  WHERE b.w1 <> '' AND b.w2 <> ''),
      |joined AS (
      |  SELECT sb.doc_id, sb.lang,
      |    CASE WHEN cv.cv IS NOT NULL AND n1w.n1w IS NOT NULL THEN
      |      CAST(round(-log2(
      |        (greatest(CAST(COALESCE(cnt.cvw, 0) AS DOUBLE) - 0.75, 0.0)
      |         + 0.75 * CAST(cv.n1v AS DOUBLE)
      |           * (CAST(n1w.n1w AS DOUBLE) / CAST(n1tot.n1tot AS DOUBLE)))
      |        / CAST(cv.cv AS DOUBLE)) * 1000000.0) AS BIGINT)
      |    END AS mb
      |  FROM sb
      |  LEFT JOIN cnt ON cnt.w1 = sb.w1 AND cnt.w2 = sb.w2
      |  LEFT JOIN cv ON cv.w1 = sb.w1
      |  LEFT JOIN n1w ON n1w.w2 = sb.w2
      |  CROSS JOIN n1tot),
      |perdoc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(CASE WHEN mb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
      |    CAST(SUM(CASE WHEN mb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
      |    CAST(COALESCE(SUM(mb), 0) AS BIGINT) AS micro_bits
      |  FROM joined GROUP BY doc_id, lang)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_scored) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(n_skipped) AS BIGINT) AS n_oov,
      |  CAST(SUM(micro_bits) AS BIGINT) AS total_micro_bits,
      |  CAST(SUM(micro_bits) // greatest(SUM(n_scored), 1) AS BIGINT)
      |    AS mean_micro_bits
      |FROM perdoc GROUP BY lang""".stripMargin

  // RRF rank weights (q202): round-half-up micros of 1/(60+r) for ranks
  // 1..20, generated with INTEGER arithmetic only (no runtime float),
  // shared verbatim with the oracle VALUES list. k = 60 is the
  // Cormack/Clarke/Buettcher default.
  private val RrfMicro: Seq[(Int, Long)] =
    (1 to 20).map(r => r -> (2000000L + (60 + r)) / (2L * (60 + r)))

  // ------------------------------------------------------------------
  // q202: reciprocal-rank fusion of two retrievers (Cormack, Clarke &
  // Buettcher 2009) over the fixed query workload — ranker A orders by
  // total query-term frequency, ranker B by query-term coverage with a
  // shortest-document tiebreak; both integer scores, so the per-query
  // rankings are exact. Fusion: each doc's fused score is the sum of
  // frozen micro-weights 1/(60+rank) over the rankers where it appears
  // in the top 20; top 5 per query by (fused desc, doc_id). The
  // ensemble step every multi-retriever search stack runs — lexical +
  // semantic lists merge the same way.
  //
  // 100 TB shape: corpus-sized work is the postings of the query terms
  // (qterms broadcast into the scan, q139's shape); ONE (qid, doc)
  // aggregation; rank windows partition per (qid, ranker) over
  // candidate lists; weights and the final top-5 are dimension-sized.
  // ------------------------------------------------------------------
  /** q202's corpus stage — the only part that touches all documents.
    * Package-visible so ExchangeBudgetSpec can gate it: the
    * localCheckpoint in q202RrfFusion hides it from the final plan. */
  private[graft] def q202CandPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qterms = QueryTerms.toDF("qid", "term")
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    words.join(broadcast(qterms), "term")
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("sa"),           // ranker A: total tf
        countDistinct(col("term")).as("cov"), // ranker B: coverage...
        first(col("n_chars")).as("len"))      // ...tiebroken by length
  }

  /** Ranker-B composite sort key: (cov DESC, len ASC) packed exactly
    * into one double as cov*2^32 - len. Field separation requires
    * len < 2^32 (enforced loudly by assert_true — Spark caps single
    * strings below 2^31 chars, so only a lying n_chars column can
    * trip it); exactness requires cov < 2^21 (cov is bounded by the
    * fixed QueryTerms list). Factored out so RetrievalPackingSpec can
    * pin the ordering on million-char documents the driver data never
    * produces. */
  private[graft] def q202RankerBKey(cov: org.apache.spark.sql.Column,
      len: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      assert_true(len < lit(4294967296L),
        lit("q202 ranker-B packing requires n_chars < 2^32")
      ).cast(DoubleType),
      lit(0.0)) + cov.cast(DoubleType) * 4294967296.0 - len.cast(DoubleType)

  def q202RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKAggregate.topK
    import spark.implicits._
    val weights = RrfMicro.toDF("rnk", "w")
    val cand = q202CandPlan(spark, dir)
      .localCheckpoint() // both ranker heaps read it
    // top-20 per (qid, ranker) via bounded map-side heaps — the
    // row_number() dual sorts each query's WHOLE candidate list on one
    // task (only |queries| partitions; measured 1.6x at 10x). Ranker
    // B's composite order (cov desc, len asc) packs exactly into one
    // double: cov*2^32 - len. Field separation needs len < 2^32 (any
    // real document satisfies this — Spark caps a single string below
    // 2^31 chars — and the assert_true guard rejects a lying n_chars
    // column loudly instead of silently mis-ordering); exactness needs
    // cov < 2^21 so both addends and the difference stay under 2^53
    // (cov is bounded by the fixed QueryTerms list, far below that).
    // doc_id asc is the heap's built-in tiebreak.
    val listA = cand.groupBy(col("qid"))
      .agg(topK(col("sa").cast(DoubleType), col("doc_id"), 20).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("qid"), col("e.id").as("doc_id"), (col("p") + 1).as("rnk"))
    val listB = cand.groupBy(col("qid"))
      .agg(topK(q202RankerBKey(col("cov"), col("len")), col("doc_id"), 20)
        .as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("qid"), col("e.id").as("doc_id"), (col("p") + 1).as("rnk"))
    listA.unionByName(listB)
      .join(broadcast(weights), "rnk")
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w")).as("fused_micro"))
      .groupBy(col("qid"))
      .agg(topK(col("fused_micro").cast(DoubleType), col("doc_id"), 5).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p0", "e")))
      .select(col("qid"), col("e.id").as("doc_id"),
        col("e.score").cast(LongType).as("fused_micro"),
        (col("p0") + 1).cast(IntegerType).as("p"))
  }

  val q202Sql: String = {
    val qvals = QueryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    val wvals = RrfMicro.map { case (r, w) => s"($r, $w)" }.mkString(", ")
    s"""WITH qt(qid, term) AS (VALUES $qvals),
       |wt(rnk, w) AS (VALUES $wvals),
       |words AS (
       |  SELECT doc_id, n_chars, unnest(str_split(text, ' ')) AS term
       |  FROM documents),
       |cand AS (
       |  SELECT qt.qid, w.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS sa,
       |    CAST(COUNT(DISTINCT w.term) AS BIGINT) AS cov,
       |    MIN(w.n_chars) AS len
       |  FROM words w JOIN qt ON w.term = qt.term AND w.term <> ''
       |  GROUP BY 1, 2),
       |la AS (
       |  SELECT qid, doc_id, row_number() OVER
       |    (PARTITION BY qid ORDER BY sa DESC, doc_id) AS rnk FROM cand),
       |lb AS (
       |  SELECT qid, doc_id, row_number() OVER
       |    (PARTITION BY qid ORDER BY cov DESC, len, doc_id) AS rnk FROM cand),
       |fused AS (
       |  SELECT qid, doc_id, CAST(SUM(w) AS BIGINT) AS fused_micro
       |  FROM (SELECT * FROM la WHERE rnk <= 20
       |        UNION ALL SELECT * FROM lb WHERE rnk <= 20) u
       |  JOIN wt USING (rnk)
       |  GROUP BY 1, 2)
       |SELECT CAST(qid AS BIGINT) AS qid, doc_id, fused_micro,
       |  CAST(p AS INTEGER) AS p FROM (
       |  SELECT qid, doc_id, fused_micro, row_number() OVER
       |    (PARTITION BY qid ORDER BY fused_micro DESC, doc_id) AS p
       |  FROM fused) r
       |WHERE p <= 5""".stripMargin
  }
}
