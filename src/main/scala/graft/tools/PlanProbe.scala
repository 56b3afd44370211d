package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * The one parameterized plan/timing probe (absorbs the former
 * per-round one-off tools):
 *
 *   runMain graft.tools.PlanProbe [--full] [--time] [--dir D] [--conf k=v] [query...]
 *
 *  - default prints just the exchange operators of each query's
 *    executed plan (shuffle-budget debugging);
 *  - `--full` prints the whole executed plan (explain-style probing);
 *  - `--time` prints wall time per query (single-query bench probing;
 *    use ScaleBench for two-dir ratio runs);
 *  - `--dir` selects the data dir (default sf0.001);
 *  - `--conf k=v` sets a session conf (repeatable — e.g. the
 *    graft.pagerank.broadcastNodes or graft.q115.approx switches).
 */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    var full = false; var time = false
    var dir = "/root/testdata/sf0.001"
    val confs = Seq.newBuilder[(String, String)]
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--full" => full = true
        case "--time" => time = true
        case "--dir" => dir = args(i + 1); i += 1
        case "--conf" =>
          val Array(k, v) = args(i + 1).split("=", 2)
          confs += ((k, v)); i += 1
        case q => names += q
      }
      i += 1
    }
    val qs = {
      val ns = names.result()
      if (ns.nonEmpty) ns
      else Seq("q2_filter_pushdown", "q64_gopher_rules",
        "q86_length_bins", "q88_bigram_pmi")
    }
    // honor the bench's core-count env so probe timings are comparable
    // to Bench's local[$SPARK_GRAFT_CPUS] session (round 16; default 8
    // keeps the historical probe behavior)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.result().foreach { case (k, v) => spark.conf.set(k, v) }
    qs.foreach { n =>
      // the fn call is INSIDE the timer: pipeline queries (q20+, q181)
      // do their table writes in the call itself — timing only the
      // returned frame's collect would underreport them ~10×
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"=== $n" + (if (time) f" (${secs}%.2f s)" else ""))
      val plan = df.queryExecution.executedPlan.toString
      if (full) plan.linesIterator.foreach(l => println("  " + l))
      else plan.linesIterator
        .filter(_.toLowerCase(java.util.Locale.ROOT).contains("exchange"))
        .foreach(l => println("  " + l.trim.take(140)))
    }
    spark.stop()
  }
}
