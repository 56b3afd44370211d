package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the exchange operators of selected queries' executed plans
  * (args = query names; default: the ExchangeBudgetSpec outliers). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q2_filter_pushdown", "q64_gopher_rules",
        "q86_length_bins", "q88_bigram_pmi")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"=== $n")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.toLowerCase.contains("exchange"))
        .foreach(l => println("  " + l.trim.take(140)))
    }
    spark.stop()
  }
}
