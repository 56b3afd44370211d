package graft.cache

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Sorted, range-partitioned table writes — the data-SKIPPING layout for
 * 100 TB scans: `repartitionByRange` gives each output file a disjoint
 * key range, `sortWithinPartitions` orders rows inside each file, so
 * parquet row-group min/max statistics prune everything outside a
 * range predicate (the poor engine's Z-order; for one sort dimension it
 * IS optimal). Spark's own ORDER BY uses the same sampled range
 * partitioner — this applies it to the PERSISTED layout.
 */
object SortedWrite {

  /**
   * Write `df` as a table sorted by `sortCols`: `numFiles` output files
   * with disjoint sorted ranges.
   */
  def writeSorted(
      df: DataFrame, tableName: String,
      sortCols: Seq[String], numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).saveAsTable(tableName)
}
