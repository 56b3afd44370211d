package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity
import graft.sources.Tables

/**
 * Data-governance and model-in-the-loop curation queries: the decisions
 * a pipeline makes about WHO may see the data and WHICH model signals
 * steer it — a trained quality classifier (the fastText-style filter of
 * GPT-3/LLaMA data work, Brown et al. 2020 §2.2), URL canonicalization
 * dedup (the first dedup pass of any crawl pipeline, before content
 * hashing), contrastive hard-negative mining (Robinson et al. 2021),
 * k-anonymity auditing (Sweeney 2002), and differentially-private
 * count release (Dwork 2006, Laplace mechanism).
 *
 * Parity design (suite convention, see PretrainQueries header): integer
 * arithmetic wherever possible; transcendental outputs (exp/ln)
 * rounded to 6 dp immediately; gradient/noise addends converted to
 * exact integer micros BEFORE summing; final floats rounded to 4 dp;
 * orderings sort on rounded values with integer tiebreaks.
 */
object GovernanceQueries {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------------
  // q150: quality-classifier training — full-batch logistic regression
  // by gradient descent, predicting lang=='en' from two surface
  // features (chars, words). The Spark shape IS the 100 TB shape for
  // linear-model training: per-iteration work is ONE map-side partial
  // aggregate over the corpus (3 integer sums), weights live on the
  // driver (3 doubles) and broadcast back as literals — no per-row
  // state, no shuffle of anything corpus-sized, iteration count fixed
  // (T=3). Addends are rounded to integer micros so the partial-agg
  // sum is order-independent and exact; the sigmoid is rounded to 6 dp
  // at the point it leaves transcendental-land (the suite's q89/q139
  // contract for exp/ln parity with the oracle).
  // ------------------------------------------------------------------
  /** One gradient step's corpus plan: a single map-side-combined
    * SinglePartition aggregate (weights ride in as literals) — the
    * per-iteration stage the loop plan gate (ExchangeBudgetSpec) pins
    * to ONE exchange. */
  private[graft] def q150GradientStepPlan(
      f: DataFrame, w0: Double, w1: Double, w2: Double): DataFrame = {
    val sig = round(lit(1.0) / (lit(1.0) +
      exp(-(lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2")))), 6)
    f.agg(
      count(lit(1)).as("n"),
      sum(round((sig - col("y")) * 1000000.0).cast(LongType)).as("g0"),
      sum(round((sig - col("y")) * col("x1") * 1000000.0).cast(LongType)).as("g1"),
      sum(round((sig - col("y")) * col("x2") * 1000000.0).cast(LongType)).as("g2"))
  }

  /** The q150 feature frame (pre-checkpoint) — exposed with the step
    * plan so the gate can build one iteration end-to-end. */
  private[graft] def q150Features(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      (col("n_chars").cast(DoubleType) / 1000.0).as("x1"),
      (expr("size(filter(split(text, ' '), w -> w != ''))")
        .cast(DoubleType) / 100.0).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))

  def q150QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val f = q150Features(spark, dir)
      .localCheckpoint() // scanned 4× (3 gradient steps + accuracy)

    var (w0, w1, w2) = (0.0, 0.0, 0.0)
    var n = 0L
    for (_ <- 1 to 3) {
      val row = q150GradientStepPlan(f, w0, w1, w2).collect()(0)
      n = row.getLong(0)
      w0 = r6(w0 - (row.getLong(1).toDouble / 1000000.0) / n.toDouble)
      w1 = r6(w1 - (row.getLong(2).toDouble / 1000000.0) / n.toDouble)
      w2 = r6(w2 - (row.getLong(3).toDouble / 1000000.0) / n.toDouble)
    }
    val sig = round(lit(1.0) / (lit(1.0) +
      exp(-(lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2")))), 6)
    f.agg(count(lit(1)).as("n_docs"),
        round(sum(when((sig > 0.5) === (col("y") === 1.0), 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType), 4).as("train_acc"))
      .select(col("n_docs"), lit(w0).as("w0"), lit(w1).as("w1"),
        lit(w2).as("w2"), col("train_acc"))
  }

  val q150Sql: String = {
    def sig(w: String) =
      s"round(1/(1+exp(-($w.wa + $w.wb*x1 + $w.wc*x2))),6)"
    def grad(k: Int, prev: String) =
      s"""g$k AS (
         |  SELECT COUNT(*) AS n, MAX(wa) AS wa, MAX(wb) AS wb, MAX(wc) AS wc,
         |    SUM(CAST(round((${sig(prev)} - y)*1000000) AS BIGINT)) AS ga,
         |    SUM(CAST(round((${sig(prev)} - y)*x1*1000000) AS BIGINT)) AS gb,
         |    SUM(CAST(round((${sig(prev)} - y)*x2*1000000) AS BIGINT)) AS gc
         |  FROM f CROSS JOIN $prev),
         |w$k AS (
         |  SELECT n,
         |    round(wa - (CAST(ga AS DOUBLE)/1000000.0)/CAST(n AS DOUBLE), 6) AS wa,
         |    round(wb - (CAST(gb AS DOUBLE)/1000000.0)/CAST(n AS DOUBLE), 6) AS wb,
         |    round(wc - (CAST(gc AS DOUBLE)/1000000.0)/CAST(n AS DOUBLE), 6) AS wc
         |  FROM g$k)""".stripMargin
    s"""WITH f AS (
       |  SELECT CAST(n_chars AS DOUBLE)/1000.0 AS x1,
       |    CAST(len(list_filter(string_split(text,' '), w -> w <> ''))
       |      AS DOUBLE)/100.0 AS x2,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |w0 AS (SELECT 0.0 AS wa, 0.0 AS wb, 0.0 AS wc),
       |${grad(1, "w0")},
       |${grad(2, "w1")},
       |${grad(3, "w2")}
       |SELECT CAST(w3.n AS BIGINT) AS n_docs, wa AS w0, wb AS w1, wc AS w2,
       |  round(CAST(SUM(CASE WHEN (${sig("w3")} > 0.5) = (y = 1.0)
       |      THEN 1 ELSE 0 END) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE), 4) AS train_acc
       |FROM f CROSS JOIN w3 GROUP BY w3.n, wa, wb, wc""".stripMargin
  }

  // ------------------------------------------------------------------
  // q183: classifier calibration (reliability diagram) — before a
  // quality score gates a corpus, its predicted probabilities must
  // track empirical rates (an over-confident filter silently skews the
  // mixture). Deciles of a length-sigmoid score vs the lang=='en'
  // label; per-bin output is EXACT INTEGERS ONLY (count, Σ micro-prob,
  // positives) so the oracle never re-rounds a division — the ECE /
  // gap is a consumer-side ratio of exact tallies. One hash-agg pass.
  // ------------------------------------------------------------------
  def q183Calibration(spark: SparkSession, dir: String): DataFrame = {
    val pred = round(lit(1.0) / (lit(1.0) +
      exp(-(col("n_chars").cast(DoubleType) / 1000.0 - 1.0))), 6)
    Tables.documents(spark, dir)
      .select(
        least(floor(pred * 10.0), lit(9.0)).cast(LongType).as("bin"),
        round(pred * 1000000.0).cast(LongType).as("pred_micro"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("pred_micro")).as("sum_pred_micro"),
        sum(col("y")).as("n_pos"))
  }

  val q183Sql: String =
    """WITH scored AS (
      |  SELECT
      |    CAST(least(floor(round(1/(1+exp(-(CAST(n_chars AS DOUBLE)/1000.0 - 1.0))),6)*10.0), 9.0) AS BIGINT) AS bin,
      |    CAST(round(round(1/(1+exp(-(CAST(n_chars AS DOUBLE)/1000.0 - 1.0))),6)*1000000.0) AS BIGINT) AS pred_micro,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(pred_micro) AS BIGINT) AS sum_pred_micro,
      |  CAST(SUM(y) AS BIGINT) AS n_pos
      |FROM scored GROUP BY bin""".stripMargin

  // ------------------------------------------------------------------
  // q231: Brier-score decomposition (Murphy 1973) — the one-row audit
  // behind q183's reliability table: Brier = mean (p − y)², split into
  // reliability (binned calibration error, lower better), resolution
  // (how much the bins separate outcomes, higher better), and
  // uncertainty ō(1−ō) (the data's irreducible floor). The trio says
  // WHY a quality/langid classifier's Brier is what it is — miscalibrated
  // (fixable by recalibration) vs unresolving (needs new features).
  // Same scorer and 10-bin layout as q183.
  //
  // Exactness: predictions live as micro-ints (q183), so Σ(p−y)² is
  // the INTEGER Σ(pred_micro − y·10⁶)² — exact in DECIMAL(38,0) with
  // operands cast before products (q217) — and the per-bin terms
  // (sum_pred − n_pos·10⁶)² and (n_pos·N − P·n)² are exact integer
  // decimals too; each bin's double addend rounds at 6 dp before the
  // ≤10-row sum (q130's protocol), final values at 6 dp.
  //
  // Scale shape: ONE map-side-combined pass builds the global sums AND
  // the 10-bin table; everything after is ≤10-row arithmetic.
  // ------------------------------------------------------------------
  def q231BrierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val pred = round(lit(1.0) / (lit(1.0) +
      exp(-(col("n_chars").cast(DoubleType) / 1000.0 - 1.0))), 6)
    val scored = Tables.documents(spark, dir)
      .select(
        least(floor(pred * 10.0), lit(9.0)).cast(LongType).as("bin"),
        round(pred * 1000000.0).cast(LongType).as("pred_micro"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("pred_micro")).as("sp"),
        sum(col("y")).as("np"),
        sum((col("pred_micro") - col("y") * 1000000L).cast("decimal(38,0)") *
            (col("pred_micro") - col("y") * 1000000L).cast("decimal(38,0)"))
          .as("se"))
    val tot = bins.agg(
        sum(col("n")).as("nn"), sum(col("np")).as("pp"),
        sum(col("se")).as("se_all"))
      .localCheckpoint() // 1 row, joined back twice
    val dRel = (col("sp").cast("decimal(38,0)") -
      col("np").cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"))
    val dRes = (col("np").cast("decimal(38,0)") * col("nn").cast("decimal(38,0)") -
      col("pp").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
    bins.crossJoin(broadcast(tot))
      .select(col("nn"), col("pp"), col("se_all"),
        // reliability addend: n_k (p̄_k − ō_k)² = (sp − np·10⁶)²/(n_k·10¹²);
        // the DIFFERENCE is exact integer decimal, the square runs in
        // double (a decimal square of the resolution term would pass
        // 10³⁸ at ~10¹² docs) — deterministic either way
        round(dRel.cast(DoubleType) * dRel.cast(DoubleType) /
          (col("n").cast(DoubleType) * 1e12), 6).as("rel_k"),
        // resolution addend: n_k (ō_k − ō)² = (np·N − pp·n_k)²/(n_k·N²)
        round(dRes.cast(DoubleType) * dRes.cast(DoubleType) /
          (col("n").cast(DoubleType) * col("nn").cast(DoubleType) *
            col("nn").cast(DoubleType)), 6).as("res_k"))
      .groupBy(col("nn"), col("pp"), col("se_all"))
      .agg(round(sum(col("rel_k")), 6).as("rel_sum"),
        round(sum(col("res_k")), 6).as("res_sum"))
      .select(
        col("nn").as("n"),
        round(col("se_all").cast(DoubleType) /
          (col("nn").cast(DoubleType) * 1e12), 6).as("brier"),
        round(col("rel_sum") / col("nn").cast(DoubleType), 6).as("reliability"),
        round(col("res_sum") / col("nn").cast(DoubleType), 6).as("resolution"),
        round(col("pp").cast(DoubleType) / col("nn").cast(DoubleType) *
          (lit(1.0) - col("pp").cast(DoubleType) / col("nn").cast(DoubleType)), 6)
          .as("uncertainty"))
  }

  val q231Sql: String =
    """WITH scored AS (
      |  SELECT
      |    CAST(least(floor(round(1/(1+exp(-(CAST(n_chars AS DOUBLE)/1000.0 - 1.0))),6)*10.0), 9.0) AS BIGINT) AS bin,
      |    CAST(round(round(1/(1+exp(-(CAST(n_chars AS DOUBLE)/1000.0 - 1.0))),6)*1000000.0) AS BIGINT) AS pred_micro,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |bins AS (
      |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pred_micro) AS BIGINT) AS sp,
      |    CAST(SUM(y) AS BIGINT) AS np,
      |    SUM(CAST(pred_micro - y*1000000 AS DECIMAL(38,0))
      |        * CAST(pred_micro - y*1000000 AS DECIMAL(38,0))) AS se
      |  FROM scored GROUP BY bin),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(np) AS BIGINT) AS pp,
      |    SUM(se) AS se_all
      |  FROM bins),
      |addends AS (
      |  SELECT t.nn, t.pp, t.se_all,
      |    round(CAST(b.sp - b.np*1000000 AS DOUBLE)
      |        * CAST(b.sp - b.np*1000000 AS DOUBLE)
      |        / (CAST(b.n AS DOUBLE) * 1e12), 6) AS rel_k,
      |    round(CAST(CAST(b.np AS DECIMAL(38,0)) * t.nn
      |            - CAST(t.pp AS DECIMAL(38,0)) * b.n AS DOUBLE)
      |        * CAST(CAST(b.np AS DECIMAL(38,0)) * t.nn
      |            - CAST(t.pp AS DECIMAL(38,0)) * b.n AS DOUBLE)
      |        / (CAST(b.n AS DOUBLE) * CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE)), 6)
      |      AS res_k
      |  FROM bins b CROSS JOIN tot t)
      |SELECT nn AS n,
      |  round(CAST(se_all AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e12), 6) AS brier,
      |  round(round(SUM(rel_k), 6) / CAST(nn AS DOUBLE), 6) AS reliability,
      |  round(round(SUM(res_k), 6) / CAST(nn AS DOUBLE), 6) AS resolution,
      |  round(CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)
      |    * (1.0 - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS uncertainty
      |FROM addends
      |GROUP BY nn, pp, se_all""".stripMargin

  // ------------------------------------------------------------------
  // q151: URL canonicalization dedup — the cheapest, first dedup pass
  // of a crawl pipeline: normalize scheme/host case, strip default
  // ports and trailing slashes, drop tracking parameters (utm_*, ref,
  // fbclid), sort the surviving query params, then group. Per-row
  // string kernel + one hash aggregation on the canonical key: the
  // same zero-shuffle-then-one-exchange shape as exact dedup (q30),
  // so it absorbs 100 TB exactly as well. The synthetic URL is derived
  // deterministically from (source, doc_id) since the corpus has no
  // URL column — the CANONICALIZER is the operator under test.
  // ------------------------------------------------------------------
  def q151UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // deterministic messy URL: case noise, default port, trailing
    // slash, tracking params — keyed so true duplicates exist
    val urls = docs.select(col("doc_id"),
      concat(
        when(col("doc_id") % 2 === 0, "HTTPS").otherwise(lit("https")),
        lit("://"), col("source"), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0, ":443").otherwise(lit("")),
        lit("/d/"), (col("doc_id") % 10).cast(StringType),
        when(col("doc_id") % 5 === 0, "/").otherwise(lit("")),
        when(col("doc_id") % 2 === 0, "?utm_source=feed&b=2&a=1")
          .otherwise(lit("?a=1&b=2&ref=abc"))).as("url"))
    val canon = urls
      .withColumn("pq", expr("substring_index(url, '?', 1)"))
      .withColumn("qs", expr("substring_index(url, '?', -1)"))
      .withColumn("parts", split(col("pq"), "/"))
      .withColumn("schemehost",
        regexp_replace(lower(array_join(slice(col("parts"), 1, 3), "/")),
          ":443$", ""))
      .withColumn("path",
        regexp_replace(array_join(slice(col("parts"), 4, 1000), "/"), "/+$", ""))
      .withColumn("params", expr(
        "array_join(array_sort(filter(split(qs, '&'), " +
          "p -> NOT (startswith(p, 'utm_') OR startswith(p, 'ref=') " +
          "OR startswith(p, 'fbclid=')))), '&')"))
      .withColumn("canonical_url", concat(
        col("schemehost"), lit("/"), col("path"),
        when(col("params") === "", "").otherwise(concat(lit("?"), col("params")))))
    canon.groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_dups") > 1)
  }

  val q151Sql: String =
    """WITH urls AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
      |    || '://' || source || '.Example.COM'
      |    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
      |    || '/d/' || CAST(doc_id % 10 AS VARCHAR)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
      |        ELSE '?a=1&b=2&ref=abc' END) AS url
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(array_to_string(
      |        string_split(split_part(url, '?', 1), '/')[1:3], '/')), ':443$', '')
      |    || '/' ||
      |    regexp_replace(array_to_string(
      |        string_split(split_part(url, '?', 1), '/')[4:], '/'), '/+$', '')
      |    || (CASE WHEN array_to_string(list_sort(list_filter(
      |          string_split(split_part(url, '?', 2), '&'),
      |          p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=')
      |            OR starts_with(p, 'fbclid=')))), '&') = '' THEN ''
      |        ELSE '?' || array_to_string(list_sort(list_filter(
      |          string_split(split_part(url, '?', 2), '&'),
      |          p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'ref=')
      |            OR starts_with(p, 'fbclid=')))), '&') END) AS canonical_url
      |  FROM urls)
      |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_dups,
      |  MIN(doc_id) AS keep_id
      |FROM canon GROUP BY canonical_url HAVING COUNT(*) > 1""".stripMargin

  // ------------------------------------------------------------------
  // q152: contrastive hard-negative mining — for each query vector,
  // the top same-label neighbor (the positive) and the 3 highest-
  // cosine DIFFERENT-label vectors (the hard negatives a contrastive
  // loss learns most from). Same scale shape as q35: tiny query set
  // broadcast into the corpus scan, per-(query,kind) bounded-heap
  // top-k — the corpus never shuffles, candidates arrive pre-pruned
  // to k per partition.
  // ------------------------------------------------------------------
  def q152HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qvec"))
    val c = emb.withColumn("__cn", Similarity.norm(col("embedding")))
    val q = queries.withColumn("__qn", Similarity.norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("kind",
        when(col("label") === col("qlabel"), "pos").otherwise(lit("neg")))
      .withColumn("sim", round(
        when(col("__cn") * col("__qn") > 0,
          Similarity.dot(col("embedding"), col("qvec"))
            / (col("__qn") * col("__cn"))).otherwise(lit(0.0)), 4))
    scored.groupBy(col("query_id"), col("kind"))
      .agg(graft.functions.TopKAggregate
        .topK(col("sim"), col("vec_id").cast(LongType),
          k = 3).as("top"))
      .select(col("query_id"), col("kind"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("kind"),
        (col("pos") + 1).cast(LongType).as("rank"),
        col("entry.id").as("neighbor_id"), col("entry.score").as("sim"))
      .filter(col("kind") === "neg" || col("rank") === 1)
  }

  val q152Sql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS qlabel,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id < 10),
      |c AS (
      |  SELECT vec_id AS neighbor_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      |  FROM embeddings),
      |sims AS (
      |  SELECT query_id,
      |    CASE WHEN label = qlabel THEN 'pos' ELSE 'neg' END AS kind,
      |    neighbor_id,
      |    ROUND(list_dot_product(qv, cv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS sim
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |ranked AS (
      |  SELECT query_id, kind, neighbor_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id, kind
      |      ORDER BY sim DESC, neighbor_id ASC) AS rank
      |  FROM sims)
      |SELECT query_id, kind, rank, neighbor_id, sim FROM ranked
      |WHERE (kind = 'neg' AND rank <= 3) OR (kind = 'pos' AND rank = 1)""".stripMargin

  // ------------------------------------------------------------------
  // q153: k-anonymity audit (k=5) over quasi-identifiers (nation ×
  // market segment × account-balance thousand-bucket): every QI class
  // with fewer than k members is a re-identification risk the release
  // must suppress or generalize. One hash aggregation over the
  // relation + a broadcast dimension join — the audit costs the same
  // as a GROUP BY count at any scale.
  // ------------------------------------------------------------------
  def q153KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    cust.select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast(LongType).as("bal_bucket"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < 5)
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("c_mktsegment").as("segment"),
        col("bal_bucket"), col("class_size"))
  }

  val q153Sql: String =
    """SELECT n.n_name AS nation, c.c_mktsegment AS segment,
      |  CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS class_size
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name, c.c_mktsegment, CAST(floor(c.c_acctbal / 1000.0) AS BIGINT)
      |HAVING COUNT(*) < 5""".stripMargin

  // ------------------------------------------------------------------
  // q154: differentially-private count release — per-source document
  // counts with Laplace(b=2) noise (ε=0.5 at sensitivity 1). The noise
  // draw is the md5-uniform inverse-CDF: u from a 24-bit md5 prefix
  // (the suite's deterministic-uniform convention, q46/q65/q105),
  // noise = -b·sign(u-½)·ln(1-2|u-½|) rounded to 6 dp at the ln exit.
  // Deterministic, partition-independent, portable to the oracle —
  // exactly how a reproducible DP release pins its RNG in production
  // (seeded per released cell, not per row).
  // ------------------------------------------------------------------
  def q154DpCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val u = (conv(substring(md5(concat(lit("dp-"), col("source"))), 1, 6),
      16, 10).cast(LongType).cast(DoubleType) + 0.5) / 16777216.0
    val d = u - 0.5
    val noise = round(lit(-2.0) * signum(d) * log(lit(1.0) - lit(2.0) * abs(d)), 6)
    counts.select(col("source"), col("n_docs"),
      round(col("n_docs").cast(DoubleType) + noise, 4).as("noisy_count"))
  }

  val q154Sql: String =
    """WITH counts AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source),
      |noised AS (
      |  SELECT source, n_docs,
      |    (CAST(CAST('0x' || substr(md5('dp-' || source), 1, 6) AS BIGINT)
      |      AS DOUBLE) + 0.5) / 16777216.0 - 0.5 AS d
      |  FROM counts)
      |SELECT source, n_docs,
      |  round(CAST(n_docs AS DOUBLE) +
      |    round(-2.0 * sign(d) * ln(1.0 - 2.0 * abs(d)), 6), 4) AS noisy_count
      |FROM noised""".stripMargin

  // ------------------------------------------------------------------
  // q190: l-diversity audit — k-anonymity's (q153) stronger sibling
  // (Machanavajjhala 2007): a quasi-identifier class is safe only if
  // the SENSITIVE attribute is diverse within it, not merely populated.
  // QI = (lang, 500-char length bucket) over documents, sensitive =
  // source. Reports distinct-l and entropy-l per class and flags
  // classes below l=3 — the classes where an attacker who locates a
  // person's QI class learns their source with high confidence.
  //
  // Scale shape: two chained hash aggregations — (QI, source) counts
  // (map-side combined, the only corpus-sized pass) then a QI rollup
  // over the class-count table (dimension-sized). Entropy follows the
  // suite's transcendental convention: each ln addend rounds to 6 dp
  // at the ln() exit, the integer-weighted sum divides once, final
  // rounds to 4 dp — order-independent and oracle-replayable.
  // ------------------------------------------------------------------
  def q190LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val classCounts = Tables.documents(spark, dir)
      .select(col("lang"),
        floor(col("n_chars") / lit(500)).cast(LongType).as("len_bucket"),
        col("source"))
      .groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("cnt"))
    val tot = sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("lang"), col("len_bucket")))
    classCounts
      .withColumn("tot", tot)
      .withColumn("addend",
        col("cnt").cast(DoubleType) *
          round(log(col("cnt").cast(DoubleType) / col("tot").cast(DoubleType)), 6))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(
        sum(col("cnt")).as("class_size"),
        count(lit(1)).as("l_distinct"),
        // + 0.0 canonicalizes IEEE -0.0 (single-source classes) to 0.0
        round(-sum(col("addend")) / sum(col("cnt")).cast(DoubleType) + lit(0.0), 4)
          .as("entropy_l"))
      .withColumn("flagged", (col("l_distinct") < 3).cast("boolean"))
  }

  val q190Sql: String =
    """WITH cc AS (
      |  SELECT lang, CAST(floor(n_chars / 500) AS BIGINT) AS len_bucket,
      |    source, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2, 3),
      |wt AS (
      |  SELECT lang, len_bucket, cnt,
      |    SUM(cnt) OVER (PARTITION BY lang, len_bucket) AS tot
      |  FROM cc)
      |SELECT lang, len_bucket,
      |  CAST(SUM(cnt) AS BIGINT) AS class_size,
      |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
      |  round(-SUM(CAST(cnt AS DOUBLE)
      |      * round(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)), 6))
      |    / CAST(SUM(cnt) AS DOUBLE) + 0.0, 4) AS entropy_l,
      |  (COUNT(*) < 3) AS flagged
      |FROM wt GROUP BY lang, len_bucket""".stripMargin

  // canary phrase watchlist for q157 — in production this is the
  // secret-string registry a privacy/memorization audit checks against
  private val Canaries: Seq[String] = Seq(
    "slow scan", "hash join", "merge batch", "key agg row",
    "spark query plan", "window agg")

  // ------------------------------------------------------------------
  // q157: canary / memorization scan — count exact occurrences of a
  // watchlist of canary strings across the corpus (the leak audit run
  // before a release: seeded canaries, PII probes, eval-set strings).
  // Every canary reports a row even at zero hits (a silent miss is
  // indistinguishable from a clean corpus otherwise). The engine runs
  // the Aho-Corasick kernel ([[graft.functions
  // .MultiPatternCountExpression]]): ONE pass over each document for
  // the whole watchlist — at 100 TB the text scan is the cost, and the
  // naive replace-length identity multiplies it by k patterns. Counts
  // are replace-equivalent (greedy non-overlapping per pattern), so
  // the oracle keeps the portable k-replace formulation. No
  // tokenization assumptions: canaries crossing token boundaries hit.
  // ------------------------------------------------------------------
  def q157CanaryScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val idx2canary = Canaries.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("idx", "canary")
    docs.select(col("doc_id"),
        posexplode(graft.functions.MultiPatternFunctions
          .multiPatternCount(col("text"), Canaries)).as(Seq("idx", "occ")))
      .join(broadcast(idx2canary), "idx")
      .groupBy(col("canary"))
      .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("occ")).as("n_occurrences"),
        min(when(col("occ") > 0, col("doc_id"))).as("first_doc"))
  }

  val q157Sql: String = {
    val vals = Canaries.map(c => s"('$c')").mkString(", ")
    s"""WITH canaries(canary) AS (VALUES $vals),
       |occs AS (
       |  SELECT c.canary, d.doc_id,
       |    CAST((length(d.text) - length(replace(d.text, c.canary, '')))
       |      / length(c.canary) AS BIGINT) AS occ
       |  FROM documents d CROSS JOIN canaries c)
       |SELECT canary,
       |  CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       |  CAST(SUM(occ) AS BIGINT) AS n_occurrences,
       |  MIN(CASE WHEN occ > 0 THEN doc_id END) AS first_doc
       |FROM occs GROUP BY canary""".stripMargin
  }

  // Benford first-digit probabilities log10(1 + 1/d), frozen as integer
  // micros summing to exactly 1,000,000 — shared verbatim with the
  // oracle so no engine evaluates log10 at runtime (q156's frozen-
  // literal convention).
  private val BenfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  // ------------------------------------------------------------------
  // q199: Benford's-law conformance audit of l_extendedprice — the
  // classic fabricated-data screen (Benford 1938; Nigrini's forensic
  // framing): observed first-digit counts vs log10(1+1/d), one chi²
  // contribution PER DIGIT. Emitting the 9 per-digit rows instead of
  // one summed statistic is deliberate: a cross-row float sum has
  // engine-dependent addend order, while each row's contribution is a
  // fixed IEEE expression over exact integers — and the per-digit
  // breakdown is what an auditor reads anyway (which digits deviate).
  // The synthetic TPC-H-ish prices are near-uniform in first digit, so
  // the audit correctly screams — that is the demonstration.
  //
  // 100 TB shape: per-row leading-digit kernel feeding ONE 9-group
  // map-side-combined tally; the total-n window runs on the 9-row
  // digit table. All comparisons exact-integer until each row's one
  // rounded division.
  // ------------------------------------------------------------------
  def q199Benford(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val pm = BenfordMicro.toDF("digit", "p_micro")
    val obs = Tables.lineitem(spark, dir)
      .select(substring(col("l_extendedprice").cast(StringType), 1, 1)
        .cast(IntegerType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
    val withN = obs.withColumn("n",
      sum(col("obs")).over(Window.partitionBy()))
    withN.join(broadcast(pm), "digit")
      .withColumn("diff", col("obs") * 1000000L - col("n") * col("p_micro"))
      .select(col("digit"), col("obs"),
        round(col("n").cast(DoubleType) * col("p_micro") / 1000000.0, 4)
          .as("expected"),
        round((col("diff").cast(DoubleType) * col("diff").cast(DoubleType))
          / (col("n").cast(DoubleType) * col("p_micro") * 1000000.0), 4)
          .as("chi2_contrib"))
  }

  val q199Sql: String = {
    val vals = BenfordMicro.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH pm(digit, p_micro) AS (VALUES $vals),
       |obs AS (
       |  SELECT CAST(substr(CAST(l_extendedprice AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS obs
       |  FROM lineitem GROUP BY 1),
       |wn AS (SELECT digit, obs, CAST(SUM(obs) OVER () AS BIGINT) AS n FROM obs)
       |SELECT w.digit, w.obs,
       |  round(CAST(w.n AS DOUBLE) * pm.p_micro / 1000000.0, 4) AS expected,
       |  round((CAST(w.obs * 1000000 - w.n * pm.p_micro AS DOUBLE)
       |      * CAST(w.obs * 1000000 - w.n * pm.p_micro AS DOUBLE))
       |    / (CAST(w.n AS DOUBLE) * pm.p_micro * 1000000.0), 4) AS chi2_contrib
       |FROM wn w JOIN pm ON pm.digit = w.digit""".stripMargin
  }

  // ------------------------------------------------------------------
  // q203: t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
  // third rung of the release-privacy ladder after k-anonymity (q153)
  // and l-diversity (q190): a QI class can be large AND diverse yet
  // still leak if its sensitive-attribute DISTRIBUTION skews far from
  // the corpus-wide one. For a categorical sensitive attribute the
  // Earth Mover's Distance reduces to total variation:
  // ½·Σ|p_i − q_i|. Everything stays EXACT integer arithmetic via
  // cross-multiplication — |cnt·N − g·T| over DECIMAL(38,0) (cnt·N
  // overflows int64 at corpus scale), one truncating division at the
  // micro output, and the t=0.2 flag as the integer test 5·num>2·T·N.
  //
  // Scale shape: ONE corpus pass — the (QI, source) tally, map-side
  // combined; every later step (per-source marginals, class totals,
  // the class×source fan-out) works on dimension-sized tables, with
  // the source marginal broadcast.
  // ------------------------------------------------------------------
  /** q203's corpus stage — the only part that touches all documents.
    * Package-visible so ExchangeBudgetSpec can gate it: the
    * localCheckpoint in q203TCloseness hides it from the final plan. */
  private[graft] def q203ClassCountsPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        floor(col("n_chars") / lit(500)).cast(LongType).as("len_bucket"),
        col("source"))
      .groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("cnt"))

  def q203TCloseness(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cc = q203ClassCountsPlan(spark, dir)
      .localCheckpoint() // reused by the marginal, the totals, and the join
    val g = cc.groupBy(col("source")).agg(sum(col("cnt")).as("g"))
    val n = g.agg(sum(col("g")).as("n_total"))
    val cls = cc.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("cnt")).as("t"))
    cls.crossJoin(broadcast(g)).crossJoin(broadcast(n))
      .join(cc, Seq("lang", "len_bucket", "source"), "left")
      .select(col("lang"), col("len_bucket"), col("t"), col("n_total"),
        abs(coalesce(col("cnt"), lit(0L)).cast(dec) * col("n_total").cast(dec)
          - col("g").cast(dec) * col("t").cast(dec)).as("dev"))
      .groupBy(col("lang"), col("len_bucket"), col("t"), col("n_total"))
      .agg(sum(col("dev")).as("num"))
      .select(col("lang"), col("len_bucket"), col("t").as("class_size"),
        expr("CAST((num * 1000000) div (2 * CAST(t AS DECIMAL(38,0)) " +
          "* CAST(n_total AS DECIMAL(38,0))) AS BIGINT)").as("tvd_micro"),
        (col("num") * lit(5) >
          col("t").cast(dec) * col("n_total").cast(dec) * lit(2))
          .as("flagged"))
  }

  val q203Sql: String =
    """WITH cc AS (
      |  SELECT lang, CAST(floor(n_chars / 500) AS BIGINT) AS len_bucket,
      |    source, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2, 3),
      |g AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS g FROM cc GROUP BY 1),
      |n AS (SELECT CAST(SUM(g) AS BIGINT) AS n_total FROM g),
      |cls AS (
      |  SELECT lang, len_bucket, CAST(SUM(cnt) AS BIGINT) AS t
      |  FROM cc GROUP BY 1, 2),
      |fan AS (
      |  SELECT c.lang, c.len_bucket, c.t, n.n_total,
      |    abs(CAST(COALESCE(cc.cnt, 0) AS HUGEINT) * n.n_total
      |      - CAST(s.g AS HUGEINT) * c.t) AS dev
      |  FROM cls c CROSS JOIN g s CROSS JOIN n
      |  LEFT JOIN cc ON cc.lang = c.lang AND cc.len_bucket = c.len_bucket
      |    AND cc.source = s.source)
      |SELECT lang, len_bucket, t AS class_size,
      |  CAST((SUM(dev) * 1000000)
      |    // (2 * CAST(t AS HUGEINT) * n_total) AS BIGINT) AS tvd_micro,
      |  (SUM(dev) * 5 > 2 * CAST(t AS HUGEINT) * n_total) AS flagged
      |FROM fan GROUP BY lang, len_bucket, t, n_total""".stripMargin

  // ------------------------------------------------------------------
  // q215: Gini coefficient of document-length inequality per source —
  // the concentration audit a corpus report runs next to the
  // histogram (q78) and source-skew (q96) checks: a source whose few
  // giant documents carry most of the bytes behaves like a much
  // smaller source under any length-weighted sampler (q209's ESS is
  // the weight-side view of the same pathology). Computed EXACTLY
  // from the sorted-prefix-sum identity G = (2·Σi·y_(i) − (n+1)·Σy)
  // / (n·Σy), where Σi·y_(i) folds over VALUE POINTS — a value v with
  // count c at cumulative offset r contributes v·(c·r + c(c+1)/2) —
  // so no per-document sort ever happens. DECIMAL(38,0) keeps the
  // rank-weighted sum exact at corpus scale; one truncating micro
  // division at the output.
  //
  // Scale shape: ONE corpus pass — the (source, length) tally,
  // map-side combined; the rank window rides per-source value-point
  // lists (bounded by the length domain, not the corpus).
  // ------------------------------------------------------------------
  def q215LengthGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val pts = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").cast(LongType).as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("r", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum((col("v") * col("cnt")).cast(dec)).as("tot"),
        // cnt*(cnt+1) is always even, so `div 2` is exact — decimal `/`
        // would introduce a fractional scale into the rank-weighted sum
        sum((col("v").cast(dec) * (col("cnt").cast(dec) * col("r").cast(dec)
          + expr("CAST((cnt * (cnt + 1)) div 2 AS DECIMAL(38,0))")))).as("s"))
      .select(col("source"), col("n_docs"),
        col("tot").cast(LongType).as("sum_chars"),
        expr("CAST(((2 * s - (n_docs + 1) * tot) * 1000000) " +
          "div (CAST(n_docs AS DECIMAL(38,0)) * tot) AS BIGINT)")
          .as("gini_micro"))
  }

  val q215Sql: String =
    """WITH pts AS (
      |  SELECT source, CAST(n_chars AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |rk AS (
      |  SELECT source, v, cnt,
      |    COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
      |  FROM pts),
      |agg AS (
      |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_docs,
      |    SUM(CAST(v AS HUGEINT) * cnt) AS tot,
      |    SUM(CAST(v AS HUGEINT) * (cnt * CAST(r AS HUGEINT)
      |      + cnt * (cnt + 1) // 2)) AS s
      |  FROM rk GROUP BY 1)
      |SELECT source, n_docs, CAST(tot AS BIGINT) AS sum_chars,
      |  CAST(((2 * s - (n_docs + 1) * tot) * 1000000)
      |    // (CAST(n_docs AS HUGEINT) * tot) AS BIGINT) AS gini_micro
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------
  // q228: k-anonymity audit — the BASE metric of the release-privacy
  // family next to q190 (l-diversity) and q203 (t-closeness), over the
  // SAME quasi-identifier convention (lang, n_chars div 500): a record
  // is k-anonymous iff at least k records share its quasi-identifier
  // class, so the anonymity level of a release is the MINIMUM class
  // size, and the re-identification exposure is the mass sitting in
  // small classes. Per lang: class count, the k floor, and the
  // docs/classes below the k=5 publishing threshold.
  //
  // Scale shape: ONE map-side-combined quasi-identifier tally (classes
  // dimension, not corpus), then a per-lang rollup of the class table.
  // ------------------------------------------------------------------
  def q228KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.documents(spark, dir)
      .select(col("lang"),
        floor(col("n_chars") / lit(500)).cast(LongType).as("len_bucket"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("k"))
    classes.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_docs"),
        min(col("k")).as("k_anonymity"),
        sum(when(col("k") < 5, 1L).otherwise(0L)).as("classes_below_k5"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).as("docs_below_k5"))
      .orderBy(col("lang"))
  }

  val q228Sql: String =
    """WITH classes AS (
      |  SELECT lang, CAST(FLOOR(n_chars / 500) AS BIGINT) AS len_bucket,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM documents GROUP BY lang, len_bucket)
      |SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(k) AS BIGINT) AS n_docs,
      |  CAST(MIN(k) AS BIGINT) AS k_anonymity,
      |  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS classes_below_k5,
      |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |    AS docs_below_k5
      |FROM classes
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
}
