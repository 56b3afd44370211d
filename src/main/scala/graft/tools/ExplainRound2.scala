package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Plan audit for the round-2 queries: print the executed (AQE-final)
  * plans so join strategies and broadcast choices can be inspected. */
object ExplainRound2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q56_corr_regression", "q57_fuzzy_match",
        "q58_anomaly_zscore", "q59_semantic_dedup", "q60_kmeans_iter")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"========== $name ==========")
      println(df.queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
