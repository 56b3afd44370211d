package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/**
 * Round-16 optimization evidence dumper:
 *
 *   runMain graft.tools.PlanDump --out plans/r16 --tag before \
 *     [--dir D] [--conf k=v] query...
 *
 * For each query writes `<out>/<query>_<tag>.txt` containing the
 * `.explain("formatted")` text (the optimization brief's required
 * artifact) followed by the AQE-final executed plan (the query is run
 * through the noop sink first so the adaptive plan is final — join
 * strategies and coalesced exchanges are runtime decisions the static
 * explain can't show).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    var dir = "/root/testdata/sf0.1"
    var out = "plans/r16"
    var tag = "before"
    val confs = Seq.newBuilder[(String, String)]
    val names = Seq.newBuilder[String]
    def usage(msg: String): Nothing = {
      System.err.println(s"[plandump] $msg")
      System.err.println(
        "usage: PlanDump [--dir D] [--out O] [--tag T] [--conf k=v] query...")
      sys.exit(2)
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case f @ ("--dir" | "--out" | "--tag" | "--conf") if i + 1 >= args.length =>
          usage(s"$f needs a value")
        case "--dir" => dir = args(i + 1); i += 1
        case "--out" => out = args(i + 1); i += 1
        case "--tag" => tag = args(i + 1); i += 1
        case "--conf" =>
          args(i + 1).split("=", 2) match {
            case Array(k, v) => confs += ((k, v))
            case _ => usage(s"--conf wants k=v, got '${args(i + 1)}'")
          }
          i += 1
        case q => names += q
      }
      i += 1
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.result().foreach { case (k, v) => spark.conf.set(k, v) }
    Files.createDirectories(Paths.get(out))
    names.result().foreach { n =>
      spark.sparkContext.setJobDescription(s"plandump: $n")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      val text = s"== $n @ $dir (explain formatted) ==\n" + formatted +
        s"\n== $n AQE-final executed plan ==\n" + executed + "\n"
      Files.write(Paths.get(out, s"${n}_$tag.txt"), text.getBytes("UTF-8"))
      println(s"[plandump] wrote $out/${n}_$tag.txt")
    }
    spark.stop()
  }
}
