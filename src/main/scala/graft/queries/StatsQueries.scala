package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Statistical profiling surface: correlation/regression, fuzzy entity
 * matching, and anomaly detection — the data-quality checks a pipeline
 * runs alongside ingestion (reference exposes these via SQL pass-through
 * + pandas; here they are one distributed plan each).
 *
 * Float-parity discipline (see CoreQueries.scala header): every moment
 * (Σx, Σx², Σxy) is an EXACT decimal sum, cast to DOUBLE only at the
 * end; the closed-form double arithmetic is written with identical
 * structure in Spark and DuckDB so IEEE evaluation is bit-identical.
 * Means/variances are never computed by the engines' own streaming
 * `avg`/`corr` (order-dependent partials).
 */
object StatsQueries {

  private def dec(c: Column, p: Int = 18, s: Int = 4): Column =
    c.cast(DecimalType(p, s))

  // ------------------------------------------------------------------
  // q56: correlation + least-squares regression from exact moments.
  // Single aggregation pass (one shuffle on the group key) computes all
  // five moments; the closed forms are evaluated on the tiny grouped
  // result. At 100 TB this is the only sane formulation: one partial-
  // aggregable pass, no second scan, no order-dependent float partials.
  //   corr  = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))
  //   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  // ------------------------------------------------------------------
  def q56CorrRegression(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // Values have ≤2 decimal places → ×100 round-trips to EXACT integers
    // (identical IEEE round both engines). Integer moments sum exactly;
    // Spark sums through DECIMAL(38,0) (long Σy² would overflow),
    // DuckDB's SUM(BIGINT) is already exact HUGEINT. corr and slope are
    // invariant under the equal scaling; intercept unscales by /100.
    val x = round(col("l_quantity") * 100).cast(LongType)
    val y = round(col("l_extendedprice") * 100).cast(LongType)
    val big = (c: Column) => c.cast(DecimalType(38, 0))
    val moments = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(big(x)).cast(DoubleType).as("sx"),
      sum(big(y)).cast(DoubleType).as("sy"),
      sum(big(x * x)).cast(DoubleType).as("sxx"),
      sum(big(y * y)).cast(DoubleType).as("syy"),
      sum(big(x * y)).cast(DoubleType).as("sxy"))
    val n = col("n").cast(DoubleType)
    val covN = n * col("sxy") - col("sx") * col("sy")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val varY = n * col("syy") - col("sy") * col("sy")
    moments.select(
      col("l_returnflag"), col("n"),
      (covN / sqrt(varX * varY)).as("corr_qty_price"),
      (covN / varX).as("slope"),
      (((col("sy") - (covN / varX) * col("sx")) / n) / lit(100.0)).as("intercept"))
  }

  val q56Sql: String =
    """WITH sc AS (
      |  SELECT l_returnflag,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy,
      |    CAST(SUM(x * y) AS DOUBLE) AS sxy
      |  FROM sc GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
      |  ((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
      |    / CAST(n AS DOUBLE)) / 100.0 AS intercept
      |FROM m""".stripMargin

  // ------------------------------------------------------------------
  // q57: fuzzy entity matching via blocking + edit distance — the
  // standard entity-resolution shape at scale: a cheap blocking key
  // (name suffix) bounds the candidate pairs to within-block, so the
  // O(n²) levenshtein only runs inside small blocks (shuffle on the
  // blocking key, never a global cross join). Both engines implement
  // classic Wagner–Fischer levenshtein → identical integer distances.
  // ------------------------------------------------------------------
  def q57FuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), -3, 3).as("blk"))
    val c2 = c.select(col("c_custkey").as("c2_custkey"),
      col("c_name").as("c2_name"), col("blk"))
    c.join(c2, Seq("blk"))
      .filter(col("c_custkey") < col("c2_custkey"))
      .withColumn("dist", levenshtein(col("c_name"), col("c2_name")).cast(LongType))
      .filter(col("dist") <= 2)
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("c_custkey")).as("min_key"),
        max(col("c2_custkey")).as("max_key"))
  }

  val q57Sql: String =
    """SELECT levenshtein(a.c_name, b.c_name) AS dist, COUNT(*) AS n_pairs,
      |  MIN(a.c_custkey) AS min_key, MAX(b.c_custkey) AS max_key
      |FROM customer a JOIN customer b
      |  ON right(a.c_name, 3) = right(b.c_name, 3)
      | AND a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 2
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q58: z-score anomaly detection — two-pass: (1) one aggregation pass
  // computes exact per-group moments, (2) the tiny moment table is
  // BROADCAST back onto the fact scan to flag outliers, so the second
  // pass is shuffle-free. Squared-deviation test ((x−μ)² > k²·σ²)
  // avoids sqrt entirely — exact closed-form doubles both engines.
  // Population variance: σ² = (nΣx² − (Σx)²) / n².
  // ------------------------------------------------------------------
  def q58AnomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val x = dec(col("value"))
    val moments = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(x).cast(DoubleType).as("sx"),
      sum(x * x).cast(DoubleType).as("sxx"))
    val n = col("n").cast(DoubleType)
    val stats = moments.select(
      col("event_type").as("mt"),
      (col("sx") / n).as("mean"),
      ((n * col("sxx") - col("sx") * col("sx")) / (n * n)).as("variance"))
    ev.join(broadcast(stats), col("event_type") === col("mt"))
      .withColumn("dev", col("value") - col("mean"))
      .filter(col("dev") * col("dev") > lit(4.0) * col("variance"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        sum(dec(col("value"))).cast(DoubleType).as("sum_outlier_value"),
        min(col("event_id")).as("min_outlier_id"))
  }

  val q58Sql: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx
      |  FROM events GROUP BY event_type),
      |s AS (
      |  SELECT event_type AS mt, sx / CAST(n AS DOUBLE) AS mean,
      |    (CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS variance
      |  FROM m)
      |SELECT event_type, COUNT(*) AS n_outliers,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_outlier_value,
      |  MIN(event_id) AS min_outlier_id
      |FROM events JOIN s ON event_type = mt
      |WHERE (value - mean) * (value - mean) > 4.0 * variance
      |GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------------
  // q78: equi-width histogram profiling — the distribution summary a
  // data-quality dashboard wants for every numeric column. Two passes:
  // a tiny (min,max) aggregate COLLECTED to the driver (2 longs), then
  // a literal-only integer bucket assignment + count — no join in the
  // big-table pass at all, and the shuffle is ≤20 partial-count rows
  // per task regardless of table size. All-bigint arithmetic (width
  // rounds UP via truncating division + 1) so bucket edges are
  // bit-identical cross-engine.
  // ------------------------------------------------------------------
  def q78Histogram(spark: SparkSession, dir: String): DataFrame = {
    val nBins = 20L
    val row = Tables.documents(spark, dir)
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val width = (hi - lo) / nBins + 1 // positive longs: truncation = floor
    Tables.documents(spark, dir)
      .withColumn("bucket", expr(s"(n_chars - $lo) div $width"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * width)
      .withColumn("bucket_hi", lit(lo) + (col("bucket") + 1) * width - 1)
  }

  val q78Sql: String =
    """WITH b AS (
      |  SELECT CAST(MIN(n_chars) AS BIGINT) AS lo, CAST(MAX(n_chars) AS BIGINT) AS hi
      |  FROM documents),
      |w AS (SELECT lo, hi, (hi - lo) // 20 + 1 AS width FROM b)
      |SELECT (n_chars - lo) // width AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(lo + ((n_chars - lo) // width) * width) AS BIGINT) AS bucket_lo,
      |  CAST(MIN(lo + ((n_chars - lo) // width + 1) * width - 1) AS BIGINT) AS bucket_hi
      |FROM documents CROSS JOIN w
      |GROUP BY 1""".stripMargin
}
