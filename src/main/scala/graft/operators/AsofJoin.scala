package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed as-of join: for each left row, attach the latest right row
 * whose timestamp is ≤ the left row's timestamp, within matching keys —
 * the temporal-join primitive (market data, sessionized attribution,
 * feature point-in-time lookup) that Spark lacks natively.
 *
 * Spark-first formulation (no per-row subqueries, no range cross-join):
 * union both sides tagged, ONE hash shuffle on the keys, ONE sort by
 * (ts, tag), then `last(payload, ignoreNulls)` over an unbounded-
 * preceding running window carries the most recent right payload forward
 * onto each left row. At 100 TB that is exactly one exchange + sort of
 * left+right — the same cost as a sort-merge join — and AQE handles
 * skewed keys. Equal timestamps: the right row sorts BEFORE the left
 * (tag 0 < 1), so the match is inclusive (≤), matching DuckDB/kdb ASOF
 * semantics.
 *
 * Determinism: if the right side can hold multiple rows at the same
 * (keys, ts), pass `rightTiebreak` columns — the greatest tiebreak wins.
 */
object AsofJoin {

  /**
   * @param left       probe side
   * @param right      reference side (its payload is attached)
   * @param keys       equi-join key columns (present on both sides)
   * @param leftTs     event-time column on `left`
   * @param rightTs    event-time column on `right`
   * @param payload    right columns to attach (null when no match — LEFT
   *                   as-of semantics)
   * @param prefix     prefix for attached columns in the output
   * @param rightTiebreak extra right ordering columns for same-ts dedup
   */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], prefix: String = "asof_",
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq

    val rightTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__tag") :+
        struct(payload.map(col): _*).as("__payload") :+
        struct((rightTiebreak.map(col) :+ lit(1).as("__present")): _*).as("__tie")): _*)

    val leftTagged = left.select(
      (leftCols.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__tag") :+
        lit(null).cast(rightTagged.schema("__payload").dataType).as("__payload") :+
        lit(null).cast(rightTagged.schema("__tie").dataType).as("__tie")): _*)

    // rows-frame running window: the latest non-null right payload at or
    // before this row's ts. Sorting by (__ts, __tag, __tie) makes the
    // LAST right row at a timestamp the one carried forward.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightTagged.select(
        (keys.map(col) ++ leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__ts") :+ col("__tag") :+ col("__payload") :+ col("__tie")): _*),
        allowMissingColumns = false)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__match.$p").as(s"$prefix$p")): _*)
  }
}
