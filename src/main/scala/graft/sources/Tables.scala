package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Test-corpus table loader (TPC-H-ish star schema + events/documents/
 * embeddings parquet at /root/testdata/sf*). Central so every query reads
 * the same way and scan-level concerns live in one place.
 *
 * Scale notes:
 *  - Plain `spark.read.parquet` keeps predicate pushdown and column
 *    pruning intact — verified via `.explain` (PushedFilters/ReadSchema).
 *  - `events.parquet` is written with nanosecond timestamps, which Spark's
 *    parquet reader refuses by default (PARQUET_TYPE_ILLEGAL). We read
 *    nanos as Long (`spark.sql.legacy.parquet.nanosAsLong`) and derive a
 *    microsecond `ts` via `timestamp_micros(ns div 1000)` — a pure
 *    projection, still codegen'd, no shuffle.
 */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      // The corpus has shipped `ts` both as nanosecond INT64 (read as
      // Long via nanosAsLong) and as plain microsecond timestamps
      // (read as TIMESTAMP_NTZ); normalize either to session-zoned
      // microsecond TimestampType. Pure projection, codegen'd.
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer div, not `/` — float division loses precision above 2^53 ns
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
