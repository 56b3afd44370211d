package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.protocol._

/**
 * Executor-parallel connector fan-out — the cluster deployment of S1
 * (reference: one sequential subprocess per sync,
 * `airbyte/_executors/base.py:65-170`). When a connector supports
 * partitioned reads (a shard/slice parameter: date range, key range,
 * Kafka partition...), each Spark task launches ITS OWN connector
 * subprocess for one shard and streams that shard's protocol lines —
 * so connector I/O runs on the executors, scales with the cluster, and
 * never funnels through the driver.
 *
 * Scale shape: the seed RDD has exactly one shard per partition
 * (`parallelize(0 until n, n)`), so Spark schedules one connector per
 * task slot; downstream normalize/write sees an already-distributed
 * Dataset. The driver-side `SubprocessSource` remains the right choice
 * for connectors that cannot shard (single API cursor).
 *
 * `shardCmd` must be a serializable pure function (it ships to
 * executors). Child stderr is discarded (no tail capture on executors —
 * a blocked stderr pipe would deadlock the task otherwise); stdout is
 * consumed line-by-line and the process is reaped when the iterator
 * drains or the task fails.
 */
final class PartitionedSubprocessSource(
    val name: String,
    val catalog: ConfiguredCatalog,
    shardCmd: Int => Seq[String],
    nShards: Int) extends Source {

  override def recordJsonl(spark: SparkSession, stream: String): Dataset[String] = {
    import spark.implicits._
    val cmdF = shardCmd // avoid capturing `this` in the task closure
    val target = stream
    val seeds = spark.sparkContext.parallelize(0 until nShards, nShards)
    val payloads = seeds.mapPartitions { shards =>
      shards.flatMap { shard =>
        val pb = new ProcessBuilder(cmdF(shard): _*)
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val proc = pb.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        new Iterator[String] {
          private var nextLine: String = null
          private var done = false
          private def advance(): Unit =
            if (!done && nextLine == null) {
              nextLine = reader.readLine()
              if (nextLine == null) { done = true; proc.waitFor() }
            }
          def hasNext: Boolean = { advance(); !done }
          def next(): String = { advance(); val l = nextLine; nextLine = null; l }
        }.flatMap { line =>
          AirbyteMessage.parse(line) match {
            case Some(m) if m.messageType == MessageType.RECORD &&
              m.streamName.exists(_.equalsIgnoreCase(target)) => m.dataJson
            case _ => None
          }
        }
      }
    }
    spark.createDataset(payloads)
  }
}
