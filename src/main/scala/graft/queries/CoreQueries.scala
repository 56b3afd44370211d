package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Core parity queries: the delegated-SQL query surface of the reference
 * (filters, aggregations, joins, windows, top-k, set ops — SURVEY §2.2,
 * §2.4-2.7, §2.11) expressed Spark-first, each with a DuckDB oracle.
 *
 * Numeric discipline for oracle hash-matching: every arithmetic result
 * goes through exact DECIMAL arithmetic (cast → multiply/sum → cast back
 * to DOUBLE). Both engines then produce bit-identical doubles; raw
 * double aggregation would diverge in the last ulp because summation
 * order differs. Division happens only on already-exact doubles.
 */
object CoreQueries {

  private def dec(c: Column, p: Int = 18, s: Int = 4): Column =
    c.cast(DecimalType(p, s))

  /** TPC-H Q1-shaped pricing summary: scan → hash agg, no shuffle beyond
    * the final agg exchange; partial aggregation map-side (Catalyst). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val one = lit(1).cast(DecimalType(18, 4))
    val disc = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        // rescale the exact scale-8 sum to scale 4 BEFORE the double
        // cast: DuckDB's decimal→double is two-step (int128→double,
        // then ÷10^scale) and mis-rounds once the unscaled value tops
        // 2^53; at scale 4 the unscaled sum stays exact in double.
        // The rescale itself is exact here (products end in 0000).
        sum(disc).cast(DecimalType(38, 4)).cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + projection — exercises parquet predicate pushdown
    * and column pruning (PushedFilters/ReadSchema in explain). */
  def q2FilterPushdown(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  val q2Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Fact-to-fact join + broadcast dim: lineitem ⋈ orders ⋈ customer.
    * customer is broadcast (small dim); lineitem⋈orders co-shuffles on
    * the join key once. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val one = lit(1).cast(DecimalType(18, 4))
    // Aggregate-before-join: collapse lineitem to one row per order key
    // FIRST (map-side partial agg does most of the work), so the join
    // carries |orders| rows instead of |lineitem|, and n_orders becomes a
    // plain count — no countDistinct expand. Decimal sums are exact and
    // associative, so sum-of-per-order-sums ≡ the flat sum bit-for-bit.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("order_rev"))
    perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        sum(col("order_rev")).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  val q3Sql: String =
    """SELECT c_mktsegment, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority""".stripMargin

  /** Star-schema 4-way join with broadcast dimension chain:
    * lineitem ⋈ supplier ⋈ nation ⋈ region — all dims broadcast, so the
    * fact table never shuffles for the joins, only for the final agg. */
  def q4StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val one = lit(1).cast(DecimalType(18, 4))
    li.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q4Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** Top-k with deterministic tiebreak — TakeOrderedAndProject physical op
    * (no full sort, per-partition heaps + driver merge of k rows). */
  def q5TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  val q5Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Ranking window: per-customer top-3 orders. One hash shuffle on the
    * partition key; rank predicate applied before any downstream work. */
  def q6WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
  }

  val q6Sql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  /** Running-sum window (frame = unbounded preceding → current row) with a
    * total order inside each partition. */
  def q7WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 10)
      .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  val q7Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_suppkey < 10""".stripMargin

  /** Lag/lead window: per-user inter-event gap in seconds. */
  def q8WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_s",
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))).cast(LongType))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("gap_s")).as("total_gap_s"),
           max(col("gap_s")).as("max_gap_s"))
  }

  val q8Sql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(gap_s) AS BIGINT) AS total_gap_s, MAX(gap_s) AS max_gap_s
      |FROM (
      |  SELECT user_id, ts,
      |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      - CAST(FLOOR(epoch(CAST(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS TIMESTAMP))) AS BIGINT) AS gap_s
      |  FROM events) t
      |GROUP BY user_id""".stripMargin

  /** Per-column null/non-null statistics in one pass (reference A3,
    * `sql_processor.py:1274-1330`): single aggregate, no per-column scans. */
  def q9NullStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val aggs = count(lit(1)).as("total") +:
      o.columns.toSeq.map(c => count(col(c)).as(s"nn_$c"))
    o.agg(aggs.head, aggs.tail: _*)
  }

  val q9Sql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val nn = cols.map(c => s"COUNT($c) AS nn_$c").mkString(", ")
    s"SELECT COUNT(*) AS total, $nn FROM orders"
  }

  /** Set ops via semi/anti join: customers with vs without orders. */
  def q10SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
    val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
    withOrders.agg(count(lit(1)).as("n_with"))
      .crossJoin(withoutOrders.agg(count(lit(1)).as("n_without")))
  }

  val q10Sql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS n_with,
      |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_without""".stripMargin

  /** UNION ALL (append semantics, U1) + INTERSECT/EXCEPT surface. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val early = o.filter(col("o_orderdate") < lit("1995-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    val both = early.intersect(late)
    val onlyEarly = early.except(late)
    val unioned = early.union(late)
    both.agg(count(lit(1)).as("n_both"))
      .crossJoin(onlyEarly.agg(count(lit(1)).as("n_only_early")))
      .crossJoin(unioned.agg(count(lit(1)).as("n_union_all")))
  }

  val q11Sql: String =
    """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'),
      |     late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00')
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM early INTERSECT SELECT DISTINCT o_custkey FROM late) t) AS n_both,
      |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM early EXCEPT SELECT DISTINCT o_custkey FROM late) t) AS n_only_early,
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM early UNION ALL SELECT o_custkey FROM late) t) AS n_union_all""".stripMargin

  /** Grouping sets (rollup) — delegated-SQL surface the cache exposes. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("o_totalprice"))).cast(DoubleType).as("total"))

  val q12Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** JSON extraction (F6/S1 surface): parse `props` JSON per event. */
  def q13Json(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  val q13Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Scalar-function surface (F2 hashing, string fns, date fns). */
  def q14Scalars(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        sha2(concat_ws("|", col("o_orderkey"), col("o_orderstatus")), 256).as("row_hash"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .filter(col("o_orderkey") <= 100)
  }

  val q14Sql: String =
    """SELECT o_orderkey,
      |  sha256(o_orderkey || '|' || o_orderstatus) AS row_hash,
      |  UPPER(o_orderpriority) AS prio_upper,
      |  SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month
      |FROM orders WHERE o_orderkey <= 100""".stripMargin

  /** Tumbling event-time windows (ST7): batch-equivalent of the streaming
    * windowed aggregation; hour buckets formatted as strings. */
  def q15EventWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  val q15Sql: String =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sessionization: 30-minute-gap sessions per user (lag + cumulative
    * flag-sum). The streaming analog is session_window/flatMapGroupsWithState;
    * this is the deterministic batch equivalent. */
  def q16Sessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Column-statistics assembly (A4): min/max/avg/count per column in a
    * single aggregation pass, decimal-exact. */
  def q17ColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(
      count(lit(1)).as("n"),
      min(col("l_orderkey")).as("min_orderkey"),
      max(col("l_orderkey")).as("max_orderkey"),
      sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
      min(col("l_shipdate")).cast(DateType).as("min_shipdate"),
      max(col("l_shipdate")).cast(DateType).as("max_shipdate"),
      countDistinct(col("l_suppkey")).as("n_suppliers"))
      .withColumn("avg_qty", col("sum_qty") / col("n"))
  }

  val q17Sql: String =
    """SELECT COUNT(*) AS n,
      |  MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
      |  CAST(MAX(l_shipdate) AS DATE) AS max_shipdate,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem""".stripMargin

  /** CUBE grouping sets over two dimensions (delegated-SQL surface). */
  def q18Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))

  val q18Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  val q16Sql: String =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
    |    CASE WHEN prev_ts IS NULL
      |           OR CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - CAST(FLOOR(epoch(CAST(prev_ts AS TIMESTAMP))) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, ts,
      |          LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      |        FROM events) x) t
      |GROUP BY user_id""".stripMargin
}
