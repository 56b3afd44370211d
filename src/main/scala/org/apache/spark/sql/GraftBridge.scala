package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column↔Expression conversions
 * (Spark 4 moved `Column` onto ColumnNode; the classic bridge lives in
 * `org.apache.spark.sql.classic.ExpressionUtils`). Public Spark API offers
 * no supported way to build a Column from a custom Catalyst Expression, so
 * custom expressions (e.g. graft's UUIDv7) need this one-file shim.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
