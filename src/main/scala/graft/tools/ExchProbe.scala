package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: print executed-plan exchange counts for named queries. */
object ExchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val cnt = plan.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .count("Exchange (hash|range|Single)".r.findFirstIn(_).isDefined)
      println(s"EXCH $n = $cnt")
    }
    spark.stop()
  }
}
