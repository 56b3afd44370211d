package graft

import org.apache.spark.sql.functions._

import graft.operators.ExternalTransform

/**
 * External Arrow-worker transform: the mapInPandas-shaped subprocess
 * loop. A byte-identity worker (`cat`) exercises the ENTIRE path —
 * partition batches → framed Arrow IPC over stdin → worker → framed
 * batches on stdout → executor-side decode — so row/schema equality
 * after the loop gates framing, lifecycle, and both Arrow directions.
 */
class ExternalTransformSpec extends SparkTestBase {

  test("identity worker round-trips rows and schema, multi-partition") {
    val df = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .repartition(5)
    val out = ExternalTransform.mapPartitionsViaWorker(
      df, Seq("cat"), maxRecordsPerBatch = 64)
    assert(out.schema == df.schema)
    val a = df.orderBy("doc_id").collect().toSeq
    val b = out.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("null values and timestamps survive the wire") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), Some(2.5)), (2L, None, None),
      (3L, Some(""), Some(-1.0)))
      .toDF("id", "s", "d")
      .withColumn("ts", to_timestamp(lit("2024-02-29 23:59:59")))
      .withColumn("ts2", when(col("id") === 2, col("ts")))
    val out = ExternalTransform.mapPartitionsViaWorker(df, Seq("cat"))
    assert(out.schema == df.schema)
    assert(out.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("empty input yields an empty frame with the input schema, no worker run") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "s").filter(col("id") < 0)
    val out = ExternalTransform.mapPartitionsViaWorker(df, Seq("cat"))
    assert(out.schema == df.schema)
    assert(out.count() == 0)
  }

  test("an upstream iterator failure fails the task, never silent truncation") {
    import spark.implicits._
    // raise_error fires on row 250 DURING Arrow batch production —
    // i.e. on the writer thread feeding the worker's stdin; the task
    // must surface it instead of finishing on the frames sent so far
    val df = (1 to 500).toDF("v")
      .withColumn("x",
        when(col("v") === 250, expr("raise_error('boom-upstream')"))
          .otherwise(col("v").cast("string")))
      .coalesce(1)
    val e = intercept[Exception] {
      ExternalTransform.mapPartitionsViaWorker(df, Seq("cat"),
        maxRecordsPerBatch = 16).collect()
    }
    val all = {
      var c: Throwable = e; var s = String.valueOf(e.getMessage)
      while (c.getCause != null) { c = c.getCause; s += " | " + c.getMessage }
      s
    }
    assert(all.contains("boom-upstream") || all.contains("input iterator failed"),
      s"unexpected failure message: $all")
  }

  test("worker failure fails the task loudly with exit code and stderr") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      ExternalTransform.mapPartitionsViaWorker(df.coalesce(1),
        Seq("sh", "-c", "echo boom >&2; exit 3")).collect()
    }
    val msg = e.getCause match {
      case null => e.getMessage
      case c => c.getMessage + e.getMessage
    }
    assert(msg.contains("code 3") || msg.contains("boom"),
      s"unexpected failure message: $msg")
  }

  test("truncated worker output fails, never hangs") {
    import spark.implicits._
    val df = (1 to 500).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      ExternalTransform.mapPartitionsViaWorker(df.coalesce(1),
        Seq("sh", "-c", "head -c 7")).collect()
    }
    val all = {
      var c: Throwable = e; var s = e.getMessage
      while (c.getCause != null) { c = c.getCause; s += " | " + c.getMessage }
      s
    }
    assert(all.contains("truncated") || all.contains("worker"),
      s"unexpected failure message: $all")
  }
}
