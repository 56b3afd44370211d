package graft.datasets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Table/column statistics (reference A1-A4:
 * `airbyte/shared/sql_processor.py:87-122` models, `:1222-1238` row
 * count, `:1274-1330` single-pass null stats, `:1332-1394` assembly).
 *
 * One aggregation pass computes the row count and every column's
 * non-null count (null count = total − non-null) — never a per-column
 * scan. Distinct counts use approx_count_distinct (HLL) so the pass
 * stays single-shuffle at any scale.
 */
object TableStatistics {

  final case class ColumnStats(
      name: String, dataType: String,
      nonNullCount: Long, nullCount: Long, approxDistinct: Long)

  final case class TableStats(
      rowCount: Long, columns: Seq[ColumnStats])

  def collect(df: DataFrame, withDistinct: Boolean = true): TableStats = {
    val cols = df.schema.fields
    val aggs =
      count(lit(1)).as("__total") +:
      (cols.map(f => count(col(f.name)).as(s"__nn_${f.name}")) ++
       (if (withDistinct)
          cols.map(f => approx_count_distinct(col(f.name)).as(s"__ad_${f.name}"))
        else Array.empty[org.apache.spark.sql.Column])).toSeq
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    val columns = cols.map { f =>
      val nn = row.getAs[Long](s"__nn_${f.name}")
      val ad = if (withDistinct) row.getAs[Long](s"__ad_${f.name}") else -1L
      ColumnStats(f.name, f.dataType.simpleString, nn, total - nn, ad)
    }
    TableStats(total, columns.toSeq)
  }

  // ------------------------------------------------------------------
  // Incremental distinct counting via MERGEABLE sketches: per-batch
  // Apache DataSketches HLL states persist alongside the data; a global
  // distinct estimate is a union of stored sketches — each sync touches
  // only its own batch, never re-scans history. This is the only
  // distinct-count design that survives at 100 TB with daily syncs.
  // ------------------------------------------------------------------

  /** Per-group HLL sketch states for `valueCol` (one binary per group),
    * suitable for persisting in a stats table. */
  def distinctSketches(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Union previously stored sketches into one global distinct estimate
    * — no raw-data access. */
  def mergeDistinct(sketches: DataFrame): Long =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .collect()(0).getLong(0)
}
