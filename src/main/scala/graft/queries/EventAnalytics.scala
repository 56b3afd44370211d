package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Event-analytics surface: cohort retention, funnels, and time-series
 * gap filling — the product-analytics queries an ELT cache serves.
 * All decisions are integer/date arithmetic (no float thresholds);
 * timestamps compare at microsecond precision in both engines (q44's
 * TIMESTAMP_NS → µs truncation rule).
 */
object EventAnalytics {

  // ------------------------------------------------------------------
  // q67: cohort retention — users cohorted by the ISO week of their
  // first event; activity counted per (cohort_week, week_offset).
  // Two aggregations: first-seen per user (one shuffle on user_id),
  // then the tiny cohort map rides a BROADCAST back onto the scan.
  // ------------------------------------------------------------------
  def q67CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    ev.join(broadcast(cohorts), "user_id")
      .withColumn("week_offset",
        expr("datediff(to_date(ts), cohort_week) div 7"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        count(lit(1)).as("n_events"))
  }

  val q67Sql: String =
    """WITH cohorts AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT c.cohort_week,
      |  date_diff('day', c.cohort_week, CAST(e.ts AS DATE)) // 7 AS week_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
      |  COUNT(*) AS n_events
      |FROM events e JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q68: ordered funnel (view → click → purchase): each stage's
  // earliest qualifying timestamp must follow the previous stage's.
  // Three passes, each a per-user aggregate + broadcast of the
  // (tiny) qualified-user map — the fact scan never shuffles.
  // ------------------------------------------------------------------
  def q68Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(broadcast(v), "user_id").filter(col("ts") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(broadcast(c), "user_id").filter(col("ts") >= col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_viewed"))
      .crossJoin(c.agg(count(lit(1)).as("n_clicked_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchased_after_click")))
  }

  val q68Sql: String =
    """WITH v AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS v_ts
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS c_ts
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.v_ts
      |  GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS p_ts
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.c_ts
      |  GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
      |  (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
      |  (SELECT COUNT(*) FROM p) AS n_purchased_after_click""".stripMargin

  // ------------------------------------------------------------------
  // q69: time-series gap filling — a dense day spine (sequence over the
  // observed span) LEFT-joined with sparse daily tallies (rare events:
  // value > 99), zeros filled. The spine is generated, never scanned;
  // at scale it is a few thousand rows broadcast against the
  // aggregated (small) daily counts.
  // ------------------------------------------------------------------
  def q69GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val rare = ev.filter(col("value") > 99.0)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val span = ev.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
    val spine = span.select(explode(
      expr("sequence(d0, d1, interval 1 day)")).as("day"))
    spine.join(rare, Seq("day"), "left_outer")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_zero_days"),
        sum(col("n")).as("total_rare"),
        min(when(col("n") === 0, col("day"))).as("first_gap_day"))
  }

  val q69Sql: String =
    """WITH rare AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events WHERE value > 99.0 GROUP BY 1),
      |span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |filled AS (
      |  SELECT s.day, COALESCE(r.n, 0) AS n FROM spine s LEFT JOIN rare r USING (day))
      |SELECT COUNT(*) AS n_days,
      |  CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_days,
      |  CAST(SUM(n) AS BIGINT) AS total_rare,
      |  MIN(CASE WHEN n = 0 THEN day END) AS first_gap_day
      |FROM filled""".stripMargin

  // ------------------------------------------------------------------
  // q71: rolling 7-day window — a RANGE frame over epoch-day (current
  // day + 6 preceding CALENDAR days, not 6 preceding rows), the shape
  // rows-frames get wrong whenever days are missing. Pre-aggregating to
  // daily grain first keeps the window input tiny (days × types), so
  // the sort-window cost is independent of raw event volume.
  // ------------------------------------------------------------------
  def q71RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("dval"))
      .withColumn("ed", unix_date(col("day")).cast(LongType))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ed"))
      .rangeBetween(-6, 0)
    daily.select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(w).as("rolling_n"),
        sum(col("dval")).over(w).cast(DoubleType).as("rolling_value"))
  }

  val q71Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,4))) AS dval,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      |  FROM events GROUP BY 1, 2, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
      |SELECT event_type, day, n,
      |  CAST(SUM(n) OVER w AS BIGINT) AS rolling_n,
      |  CAST(SUM(dval) OVER w AS DOUBLE) AS rolling_value
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY ed
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin
}
