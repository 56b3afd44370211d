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

  /**
   * Distributed Arrow IPC export (reference S11, `caches/base.py:292-322`
   * — chunked `to_arrow`): each partition's rows become self-describing
   * Arrow record batches of ≤`maxRecordsPerBatch` rows (the reference's
   * 100k chunk default), produced IN PARALLEL on executors. The bytes
   * are the standard IPC wire format any Arrow client (pandas, polars,
   * DuckDB, Flight) consumes. `private[sql]` machinery, hence this shim.
   */
  def toArrowBatches(
      df: DataFrame,
      maxRecordsPerBatch: Long = 100000L): org.apache.spark.rdd.RDD[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.queryExecution.toRdd.mapPartitions { it =>
      execution.arrow.ArrowConverters.toBatchWithSchemaIterator(
        it, schema, maxRecordsPerBatch, Long.MaxValue, tz,
        true, false)
    }
  }

  /** Distributed inverse of [[toArrowBatches]]: an RDD of
    * self-describing Arrow batches back to a DataFrame WITHOUT passing
    * through the driver — each partition decodes its own batches on
    * the executor (the return path of an external-worker transform).
    * The driver reads only ONE batch to learn the schema. */
  def fromArrowBatchesRdd(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[Array[Byte]]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val first = rdd.take(1)
    require(first.nonEmpty, "fromArrowBatchesRdd: no batches to infer schema")
    val (_, schema) =
      execution.arrow.ArrowConverters.fromBatchWithSchemaIterator(
        first.iterator, null)
    val rows = rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val (rs, partSchema) =
          execution.arrow.ArrowConverters.fromBatchWithSchemaIterator(it, null)
        val proj =
          org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(partSchema)
        rs.map(r =>
          proj(r).copy().asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      }
    }
    session.internalCreateDataFrame(rows, schema)
  }

  /** Inverse of [[toArrowBatches]]: self-describing Arrow batches back
    * to a DataFrame (schema read from the batches themselves). */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]]): DataFrame = {
    val (rows, schema) =
      execution.arrow.ArrowConverters.fromBatchWithSchemaIterator(batches, null)
    val session = spark.asInstanceOf[classic.SparkSession]
    // batch-backed rows are reused buffers — copy through a projection
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
    val copied = rows.map(r =>
      proj(r).copy().asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]).toSeq
    session.internalCreateDataFrame(session.sparkContext.parallelize(copied), schema)
  }
}
