package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AsofJoin, SkewJoin}
import graft.sources.Tables

/**
 * Round-2 analytics surface: temporal joins, skew-safe joins, grouping
 * sets, pivot, PII scrubbing, and the training-data-pipeline additions
 * (stratified sampling, benchmark contamination, within-doc repetition,
 * distinctive terms).
 *
 * Oracle-parity discipline follows `CoreQueries.scala`: exact DECIMAL
 * sums cast to DOUBLE at the end, BIGINT casts on DuckDB integer sums,
 * integer-ratio divisions rounded to 4 digits, deterministic tiebreaks.
 */
object AnalyticsQueries {

  private def dec(c: Column, p: Int = 18, s: Int = 4): Column =
    c.cast(DecimalType(p, s))

  // ------------------------------------------------------------------
  // q44: as-of join (backward, inclusive) — click → most recent prior
  // purchase per user. One shuffle + sort; see operators/AsofJoin.scala.
  // ------------------------------------------------------------------
  def q44AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsofJoin.backward(clicks, purchases, Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        payload = Seq("event_id", "value"), prefix = "prior_")
      .select(col("event_id"), col("user_id"),
        col("prior_event_id"), col("prior_value"))
  }

  // DuckDB TIMESTAMP is µs; CAST from the parquet TIMESTAMP_NS truncates
  // exactly like Tables.load's `nanos div 1000` — both engines compare
  // at microsecond precision.
  val q44Sql: String =
    """SELECT l.event_id, l.user_id,
      |  r.event_id AS prior_event_id, r.value AS prior_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN
      |     (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase') r
      |ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  // ------------------------------------------------------------------
  // q45: salted skew join — orders ⋈ customer with an explicit per-row
  // salt spreading each hot custkey over 8 reducers. Result is
  // identical to the plain join (the oracle).
  // ------------------------------------------------------------------
  def q45SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    SkewJoin.saltedEquiJoin(o, c, "o_custkey", "c_custkey",
        saltSrc = col("o_orderkey"), buckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
  }

  val q45Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // q46: deterministic stratified sampling — md5-prefix Bernoulli gate
  // per document, tallied per language stratum. Portable (same md5 hex
  // both engines), reproducible, and partition-independent: the sample
  // is a pure function of doc_id, so re-runs and re-partitions at
  // 100 TB select the same rows.
  // ------------------------------------------------------------------
  def q46StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inSample = md5(col("doc_id").cast(StringType)) < "28" // ≈ 15.6 %
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(inSample, 1L).otherwise(0L)).as("n_sampled"),
        min(when(inSample, col("doc_id"))).as("min_sampled_id"),
        max(when(inSample, col("doc_id"))).as("max_sampled_id"))
  }

  val q46Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '28' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  MIN(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '28' THEN doc_id END) AS min_sampled_id,
      |  MAX(CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '28' THEN doc_id END) AS max_sampled_id
      |FROM documents GROUP BY lang""".stripMargin

  // ------------------------------------------------------------------
  // q47: benchmark contamination — corpus docs sharing ≥1 word-3-gram
  // with a held-out "benchmark" slice (doc_id % 97 = 0), per language.
  // The benchmark shingle set is tiny → broadcast; the corpus side is
  // one explode + semi-join — no pairwise comparison, scales linearly.
  // ------------------------------------------------------------------
  def q47Contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        array_distinct(graft.functions.TextHashFunctions
          .shingleMinhash(col("text"), 1, 3).getField("shingles")).as("sh"))
      .filter(size(col("sh")) > 0)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("lang"), explode(col("sh")).as("shingle")).distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("lang"), explode(col("sh")).as("shingle"))
    corpus.join(broadcast(bench), Seq("lang", "shingle"), "left_semi")
      .select(col("lang"), col("doc_id")).distinct()
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  val q47Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
      |      i -> concat_ws(' ', string_split(text,' ')[i],
      |                          string_split(text,' ')[i+1],
      |                          string_split(text,' ')[i+2]))) AS s
      |  FROM documents),
      |b AS (SELECT DISTINCT lang, unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0 AND len(s) > 0),
      |c AS (SELECT doc_id, lang, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0 AND len(s) > 0)
      |SELECT c.lang, CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_contaminated
      |FROM c JOIN b ON c.lang = b.lang AND c.shingle = b.shingle
      |GROUP BY c.lang""".stripMargin

  // ------------------------------------------------------------------
  // q48: within-document repetition ratio (Gopher-style repetition
  // signal): 1 − distinct/total word-3-grams. Pure per-row compute —
  // no shuffle at all until the (absent) final exchange.
  // ------------------------------------------------------------------
  def q48Repetition(spark: SparkSession, dir: String): DataFrame = {
    val raw = graft.functions.TextHashFunctions
      .shingleMinhash(col("text"), 1, 3).getField("shingles")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), raw.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("lang"),
        size(col("sh")).cast(LongType).as("n_shingles"),
        size(array_distinct(col("sh"))).cast(LongType).as("n_distinct"))
      .withColumn("rep_ratio", round(
        lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_shingles").cast(DoubleType), 4))
  }

  val q48Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_transform(
      |      range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
      |      i -> concat_ws(' ', string_split(text,' ')[i],
      |                          string_split(text,' ')[i+1],
      |                          string_split(text,' ')[i+2])) AS s
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CAST(len(s) AS BIGINT) AS n_shingles,
      |  CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct,
      |  round(1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / CAST(len(s) AS DOUBLE), 4) AS rep_ratio
      |FROM sh WHERE len(s) > 0""".stripMargin

  // ------------------------------------------------------------------
  // q49: distinctive terms per language — top-5 tokens by term frequency
  // among tokens in ≤30 % of documents. Integer-only scoring (no ln) so
  // the ranking is bit-portable; document frequency computed once over
  // the corpus, joined back broadcast.
  // ------------------------------------------------------------------
  def q49DistinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val docFreq = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val tf = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("tf").desc, col("tok").asc)
    tf.join(broadcast(docFreq), "tok")
      .crossJoin(nDocs)
      .filter(col("df") * 10 <= col("n_total") * 3)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("tok"), col("tf"), col("rank"))
  }

  val q49Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
      |tf AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY lang, tok),
      |n AS (SELECT COUNT(*) AS n_total FROM documents)
      |SELECT lang, tok, tf, rank FROM (
      |  SELECT tf.lang, tf.tok, tf.tf,
      |    CAST(row_number() OVER (PARTITION BY tf.lang ORDER BY tf.tf DESC, tf.tok ASC) AS BIGINT) AS rank
      |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
      |  WHERE df.df * 10 <= n.n_total * 3)
      |WHERE rank <= 5""".stripMargin

  // ------------------------------------------------------------------
  // q50: GROUPING SETS + grouping_id (§2.4/§2.11 surface beyond
  // rollup/cube): three explicit aggregation levels in one scan.
  // ------------------------------------------------------------------
  def q50GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |""".stripMargin)
  }

  val q50Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin

  // ------------------------------------------------------------------
  // q51: pivot — event values spread per type across user deciles.
  // Spark's relational pivot; the oracle is the equivalent manual
  // CASE-WHEN aggregation.
  // ------------------------------------------------------------------
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q51Pivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy(col("bucket"))
      .pivot("event_type", EventTypes)
      .agg(sum(dec(col("value"))).cast(DoubleType))
  }

  val q51Sql: String = {
    val cases = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS $t")
      .mkString(",\n  ")
    s"""SELECT user_id % 10 AS bucket,
       |  $cases
       |FROM events GROUP BY user_id % 10""".stripMargin
  }

  // ------------------------------------------------------------------
  // q52: PII-style scrubbing over semi-structured props — digit masking
  // with per-type redaction tallies. regexp_replace/regexp_count are
  // codegen'd Spark natives; no UDF.
  // ------------------------------------------------------------------
  def q52PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"), col("props"),
        regexp_replace(col("props"), "[0-9]", "#").as("scrubbed"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(regexp_count(col("props"), lit("[0-9]"))).as("n_digits_redacted"),
        countDistinct(col("scrubbed")).as("n_patterns"))
  }

  val q52Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(len(regexp_extract_all(props, '[0-9]'))) AS BIGINT) AS n_digits_redacted,
      |  COUNT(DISTINCT regexp_replace(props, '[0-9]', '#', 'g')) AS n_patterns
      |FROM events GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q53: exact percentiles (data profiling) — Spark's `percentile` and
  // DuckDB's `quantile_cont` both linear-interpolate at (n−1)·p; probed
  // bit-identical on this data (including last-ulp artifacts).
  // ------------------------------------------------------------------
  def q53Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        percentile(col("n_chars"), lit(0.25)).as("p25"),
        percentile(col("n_chars"), lit(0.5)).as("p50"),
        percentile(col("n_chars"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))

  val q53Sql: String =
    """SELECT lang,
      |  quantile_cont(n_chars, 0.25) AS p25,
      |  quantile_cont(n_chars, 0.5)  AS p50,
      |  quantile_cont(n_chars, 0.9)  AS p90,
      |  COUNT(*) AS n
      |FROM documents GROUP BY lang""".stripMargin

  // ------------------------------------------------------------------
  // q54: range (band) join — values bucketed into static intervals via
  // a broadcast inequality join (BroadcastNestedLoop on a 5-row dim:
  // the fact side never shuffles for the join).
  // ------------------------------------------------------------------
  def q54RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (0.0, 20.0, "b0_20"), (20.0, 40.0, "b20_40"), (40.0, 60.0, "b40_60"),
      (60.0, 80.0, "b60_80"), (80.0, 1e9, "b80_plus"))
      .toDF("lo", "hi", "band")
    Tables.events(spark, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
  }

  val q54Sql: String =
    """SELECT band, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |JOIN (VALUES (0.0, 20.0, 'b0_20'), (20.0, 40.0, 'b20_40'),
      |             (40.0, 60.0, 'b40_60'), (60.0, 80.0, 'b60_80'),
      |             (80.0, 1e9, 'b80_plus')) AS bands(lo, hi, band)
      |  ON value >= lo AND value < hi
      |GROUP BY band""".stripMargin

  // ------------------------------------------------------------------
  // q55: ranking-function breadth — ntile/percent_rank/cume_dist (all
  // integer-ratio outputs → bit-portable) summarized per quartile.
  // ------------------------------------------------------------------
  def q55WindowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(max(col("pr")), 4).as("max_pr"),
        round(max(col("cd")), 4).as("max_cd"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))
  }

  val q55Sql: String =
    """SELECT o_orderpriority, quartile, COUNT(*) AS n,
      |  round(MAX(pr), 4) AS max_pr, round(MAX(cd), 4) AS max_cd,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC))
      |GROUP BY o_orderpriority, quartile""".stripMargin

  // ------------------------------------------------------------------
  // q73: contamination screen at scale — Bloom-filter pre-screen.
  // q47's broadcast semi-join still EXPLODES every corpus shingle into
  // the join; at 100 TB that's trillions of probe rows flowing through
  // the join operator. Here a Bloom filter over the benchmark shingles
  // (one tiny aggregate job → ~KBs, broadcast once) screens shingles
  // MAP-SIDE: ~99% of corpus shingles fail `mightContain` and are
  // dropped before any join machinery. The survivors (bench hits +
  // ~0.4% false positives) go through the same exact broadcast
  // semi-join, which removes the false positives — so the final answer
  // is EXACT and oracle-checkable; the bloom is purely a work filter.
  //
  // The probe is the codegen'd BloomMightContain expression over a
  // broadcast 2^24-bit bitmap (k=3 seeded splitmix64 draws — the
  // StreamingBloom fold arithmetic), inlined into the scan's
  // whole-stage codegen: no UDF serialization boundary, no per-row
  // virtual call — this IS the map-side throughput the operator
  // exists for at 100 TB. Keys enter as xxhash64(shingle): a 64-bit
  // key collision inside the bloom only adds a false positive, which
  // the exact semi-join removes.
  // ------------------------------------------------------------------
  def q73BloomContamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        array_distinct(graft.functions.TextHashFunctions
          .shingleMinhash(col("text"), 1, 3).getField("shingles")).as("sh"))
      .filter(size(col("sh")) > 0)
    // computed ONCE (eager localCheckpoint): the count, the bloom fold,
    // and the exact semi-join all read the checkpoint — 1 corpus scan
    // for the bench side, not 3
    val bench = sh.filter(col("doc_id") % 89 === 0)
      .select(explode(col("sh")).as("shingle")).distinct()
      .localCheckpoint()
    // size the bitmap to the bench set: m ≈ 16n bits keeps fpp ≈ 0.5%
    // at k=3 REGARDLESS of benchmark-suite growth (a fixed p saturates
    // at 10× keys — measured 7% fpp → 4.3× scale ratio before this)
    val n = math.max(1L, bench.count())
    val k = 3
    val p = math.min(26, math.max(16,
      64 - java.lang.Long.numberOfLeadingZeros(16L * n - 1)))
    val bloom = new graft.streaming.StreamingBloom(p, k)
    bloom.processBatch(bench.select(xxhash64(col("shingle")).as("key")))
    val bitmap = spark.sparkContext.broadcast(bloom.wordsSnapshot)
    sh.filter(col("doc_id") % 89 =!= 0)
      .select(col("doc_id"), col("source"), explode(col("sh")).as("shingle"))
      // map-side, codegen'd: no-hit shingles never reach the join
      .filter(graft.functions.BloomMightContain.column(
        xxhash64(col("shingle")), bitmap, p, k))
      .join(broadcast(bench), Seq("shingle"), "left_semi") // exact: kills bloom FPs
      .select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  val q73Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
      |      i -> concat_ws(' ', string_split(text,' ')[i],
      |                          string_split(text,' ')[i+1],
      |                          string_split(text,' ')[i+2]))) AS s
      |  FROM documents),
      |b AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 89 = 0 AND len(s) > 0),
      |c AS (SELECT doc_id, source, unnest(s) AS shingle FROM sh WHERE doc_id % 89 <> 0 AND len(s) > 0)
      |SELECT c.source, CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_contaminated
      |FROM c JOIN b ON c.shingle = b.shingle
      |GROUP BY c.source""".stripMargin

  // ------------------------------------------------------------------
  // q74: exact k-per-group sample (deterministic reservoir dual). The
  // window formulation (`row_number() over (partition by g order by
  // md5)`) shuffles EVERY row to its group's partition before ranking;
  // the bounded TopKAggregate keeps ≤k rows per group per map task, so
  // only k·groups·partitions tiny heap entries cross the wire — at
  // 100 TB, a per-group sample without a corpus-wide shuffle. Rank key
  // is an md5 prefix (portable, partition-independent); the first 12
  // hex digits fit 2^48 < 2^53, so the negated double score is exact
  // and the aggregate's (score DESC, id ASC) order equals the oracle's
  // (hex ASC, doc_id ASC).
  // ------------------------------------------------------------------
  def q74GroupSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val hk = conv(substring(md5(col("doc_id").cast(StringType)), 1, 12), 16, 10)
      .cast(LongType)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), negate(hk.cast(DoubleType)).as("score"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopKAggregate.topK(col("score"), col("doc_id"), k).as("picks"))
      .select(col("lang"), posexplode(col("picks")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("doc_id"))
  }

  val q74Sql: String =
    """WITH r AS (
      |  SELECT lang, doc_id,
      |    row_number() OVER (
      |      PARTITION BY lang
      |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), doc_id) AS rank
      |  FROM documents)
      |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
      |FROM r WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------------------
  // q76: window-frame breadth — first/nth/last_value with explicit
  // ROWS frames plus a bounded running sum, per customer order
  // history. Exact-decimal sums cast to DOUBLE at the end (the frame
  // picks WHICH rows; decimal addition makes the fold order-proof).
  // ------------------------------------------------------------------
  def q76WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val grow = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val upToHere = grow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = grow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val last3 = grow.rowsBetween(-2, Window.currentRow)
    val price = dec(col("o_totalprice"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        first(price).over(upToHere).cast(DoubleType).as("first_price"),
        nth_value(price, 2).over(upToHere).cast(DoubleType).as("second_price"),
        last(price).over(full).cast(DoubleType).as("last_price"),
        sum(price).over(last3).cast(DoubleType).as("sum_last3"))
  }

  val q76Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(first_value(CAST(o_totalprice AS DECIMAL(18,4))) OVER upToHere AS DOUBLE) AS first_price,
      |  CAST(nth_value(CAST(o_totalprice AS DECIMAL(18,4)), 2) OVER upToHere AS DOUBLE) AS second_price,
      |  CAST(last_value(CAST(o_totalprice AS DECIMAL(18,4))) OVER wfull AS DOUBLE) AS last_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER last3 AS DOUBLE) AS sum_last3
      |FROM orders WHERE o_custkey < 200
      |WINDOW
      |  upToHere AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  last3 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  // ------------------------------------------------------------------
  // q101: market-basket co-occurrence lift — which parts ship together
  // in the same order more often than their popularity predicts. The
  // pair generation is a WITHIN-GROUP self-join on the order key (one
  // co-shuffle; both sides arrive on the same exchange), bounded by
  // basket size (≈4 lines/order), never a cross join; the a<b ordering
  // dedupes mirrored pairs. Lift uses q88's rational-ratio rule (no
  // logs), rounded 4 dp, top-15 with lexicographic tiebreak.
  // ------------------------------------------------------------------
  def q101BasketPairs(spark: SparkSession, dir: String): DataFrame = {
    // round 17 (the PostingPairs bucket-group shape): ONE groupBy(ok)
    // with a collect_set both DEDUPS (the former .distinct() exchange on
    // (ok, pk)) and materializes each basket, and pairs explode
    // IN-BUCKET — replacing the distinct + keyed self-join (two more
    // posting shuffles, no exchange reuse). Baskets are naturally
    // bounded (lines per order, ~4 at the test SFs), so the in-bucket
    // blowup is basket², the same bound the join had; the basket frame
    // is corpus-scale-safe to collect because an order's line count is
    // a data-model constant, not a df-style hot key.
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("pks"))
      .localCheckpoint() // reused by the order count, freq, and pairs
    val orders = baskets.count()
    val freq = baskets.select(explode(col("pks")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("f"))
    val pairs = baskets
      .select(explode(col("pks")).as("pa"), col("pks"))
      .select(col("pa"), explode(col("pks")).as("pb"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 3)
    // freq is part-dimension-sized (scales with SF) — plain joins, AQE
    // broadcasts them at small scale and co-shuffles beyond
    pairs
      .join(freq.select(col("pk").as("pa"), col("f").as("fa")), "pa")
      .join(freq.select(col("pk").as("pb"), col("f").as("fb")), "pb")
      .withColumn("lift", round(
        (col("n_both").cast(DoubleType) * lit(orders.toDouble)) /
          (col("fa").cast(DoubleType) * col("fb").cast(DoubleType)), 4))
      .select(col("pa"), col("pb"), col("n_both"), col("lift"))
      .orderBy(col("lift").desc, col("pa").asc, col("pb").asc)
      .limit(15)
  }

  val q101Sql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |orders AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM li),
      |freq AS (SELECT pk, COUNT(*) AS f FROM li GROUP BY pk),
      |pairs AS (
      |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_both
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT pa, pb, n_both,
      |  round((CAST(n_both AS DOUBLE) * CAST(n AS DOUBLE)) /
      |    (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)), 4) AS lift
      |FROM pairs
      |JOIN freq fa ON pairs.pa = fa.pk
      |JOIN freq fb ON pairs.pb = fb.pk
      |CROSS JOIN orders
      |ORDER BY lift DESC, pa ASC, pb ASC LIMIT 15""".stripMargin

  // ------------------------------------------------------------------
  // q102: weekday seasonality profile — per (event_type, ISO weekday)
  // volume against the flat-week expectation, deviation in integer
  // permille so both engines flag identical cells. One grouped tally
  // (7 × types rows) plus a per-type total broadcast back — the
  // weekly-pattern fingerprint that catches pipeline gaps and bot
  // traffic alike.
  // ------------------------------------------------------------------
  def q102WeekdayProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("dow", dayofweek(col("ts")).cast(LongType)) // 1=Sun..7=Sat
    val cell = ev.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
    val tot = cell.groupBy(col("event_type")).agg(sum(col("n")).as("t"))
    cell.join(broadcast(tot), "event_type")
      .withColumn("share_permille", expr("n * 1000 div t"))
      .withColumn("dev_permille", expr("n * 7000 div t - 1000"))
      .select(col("event_type"), col("dow"), col("n"),
        col("share_permille"), col("dev_permille"))
  }

  val q102Sql: String =
    """WITH cell AS (
      |  SELECT event_type,
      |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
      |  FROM cell GROUP BY event_type)
      |SELECT c.event_type, c.dow, c.n,
      |  c.n * 1000 // t.t AS share_permille,
      |  c.n * 7000 // t.t - 1000 AS dev_permille
      |FROM cell c JOIN tot t USING (event_type)""".stripMargin

  // ------------------------------------------------------------------
  // q110: small-quantity revenue (TPC-H Q17 shape) — the classic
  // correlated scalar subquery ("rows below 20% of that part's average
  // quantity") DECORRELATED into a per-part aggregate joined back
  // co-shuffled on the part key. The threshold test is pure integer
  // cross-multiplication (5·q·cnt < Σq), not a float 0.2·avg — exact
  // and portable. Prices stay in cents (BIGINT). The part dimension is
  // broadcast; the two lineitem passes share one partitioning (the agg
  // exchange is reused by the join side under AQE).
  // ------------------------------------------------------------------
  def q110SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        col("l_quantity").cast(LongType).as("q"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("sumq"), count(lit(1)).as("cnt"))
    li.join(perPart, "l_partkey")
      .filter(col("q") * 5 * col("cnt") < col("sumq"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"), sum(col("cents")).as("rev_cents"))
  }

  val q110Sql: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |pp AS (
      |  SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS sumq, COUNT(*) AS cnt
      |  FROM li GROUP BY 1)
      |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(SUM(cents) AS BIGINT) AS rev_cents
      |FROM li JOIN pp USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |WHERE q * 5 * cnt < sumq
      |GROUP BY p_brand""".stripMargin

  // ------------------------------------------------------------------
  // q111: cheapest-supplier-per-part (TPC-H Q2 shape) — the correlated
  // "WHERE price = (SELECT MIN(price) ... same part)" decorrelated as
  // min-aggregate + join-back on (part, price). Ties resolve to the
  // lowest supplier key via a second aggregate, never an arbitrary
  // first-row pick — deterministic on any engine and partitioning.
  // Both lineitem passes shuffle on l_partkey (one exchange reused);
  // the final top-20 is a TakeOrderedAndProject (per-task heaps).
  // ------------------------------------------------------------------
  def q111MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val mins = li.groupBy(col("l_partkey")).agg(min(col("cents")).as("min_cents"))
    li.join(mins, "l_partkey")
      .filter(col("cents") === col("min_cents"))
      .groupBy(col("l_partkey"))
      .agg(min(col("l_suppkey")).as("winner_suppkey"),
        min(col("min_cents")).as("min_cents"))
      .orderBy(col("l_partkey").asc)
      .limit(20)
  }

  // ------------------------------------------------------------------
  // q120: hierarchy ratio-to-parent — revenue by region → nation with
  // each nation's integer-permille share of its region. The fact table
  // co-shuffles ONCE on the customer key; everything after the
  // per-nation aggregate is dimension-sized (≤ nations rows), so the
  // parent totals are one more tiny aggregate joined back broadcast.
  // Exact cents end-to-end.
  // ------------------------------------------------------------------
  def q120HierarchyShare(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("rev_cents"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("rev_cents"))
    val perRegion = perNation.groupBy(col("r_name"))
      .agg(sum(col("rev_cents")).as("region_cents"))
    perNation.join(broadcast(perRegion), "r_name")
      .withColumn("share_permille", expr("rev_cents * 1000 div region_cents"))
      .select(col("r_name"), col("n_name"), col("rev_cents"), col("share_permille"))
  }

  val q120Sql: String =
    """WITH pn AS (
      |  SELECT c_nationkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |named AS (
      |  SELECT r_name, n_name, rev_cents
      |  FROM pn JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |pr AS (SELECT r_name, CAST(SUM(rev_cents) AS BIGINT) AS region_cents
      |  FROM named GROUP BY 1)
      |SELECT r_name, n_name, rev_cents,
      |  rev_cents * 1000 // region_cents AS share_permille
      |FROM named JOIN pr USING (r_name)""".stripMargin

  // ------------------------------------------------------------------
  // q121: top-k per group via the custom bounded TopKAggregate — the
  // relational use of the same TypedImperativeAggregate the ANN paths
  // run on. Each task keeps at most k (score,id) entries PER GROUP in
  // a heap, so only k·groups rows cross the shuffle — the window-rank
  // dual shuffles every customer row and sorts each partition. Ties
  // break to the lower id inside the aggregate itself (deterministic
  // on any partitioning; the oracle mirrors with ORDER BY cents DESC,
  // custkey ASC).
  // ------------------------------------------------------------------
  def q121TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    perCust.groupBy(col("c_nationkey").as("nationkey"))
      .agg(graft.functions.TopKAggregate
        .topK(col("cents").cast(DoubleType), col("c_custkey"), 3).as("top"))
      .select(col("nationkey"), posexplode(col("top")).as(Seq("r", "e")))
      .select(col("nationkey"), (col("r") + 1).cast(LongType).as("rank"),
        col("e.id").as("custkey"), col("e.score").cast(LongType).as("cents"))
  }

  val q121Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT c_nationkey AS nationkey, c_custkey AS custkey, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cents DESC, c_custkey ASC) AS rank
      |  FROM pc JOIN customer ON o_custkey = c_custkey)
      |SELECT nationkey, CAST(rank AS BIGINT) AS rank, custkey, cents
      |FROM ranked WHERE rank <= 3""".stripMargin

  val q111Sql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |mins AS (
      |  SELECT l_partkey, CAST(MIN(cents) AS BIGINT) AS min_cents
      |  FROM li GROUP BY 1)
      |SELECT l_partkey, MIN(l_suppkey) AS winner_suppkey,
      |  MIN(min_cents) AS min_cents
      |FROM li JOIN mins USING (l_partkey)
      |WHERE cents = min_cents
      |GROUP BY l_partkey
      |ORDER BY l_partkey ASC LIMIT 20""".stripMargin
}
