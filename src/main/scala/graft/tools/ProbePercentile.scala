package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parity probe: Spark exact percentile vs DuckDB quantile_cont. */
object ProbePercentile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .groupBy(col("lang"))
      .agg(
        percentile(col("n_chars"), lit(0.25)).as("p25"),
        percentile(col("n_chars"), lit(0.5)).as("p50"),
        percentile(col("n_chars"), lit(0.9)).as("p90"))
      .orderBy("lang")
      .collect().foreach(r => println(s"${r.getString(0)} ${r.getDouble(1)} ${r.getDouble(2)} ${r.getDouble(3)}"))
    spark.stop()
  }
}
