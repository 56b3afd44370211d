package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.cache.SparkCache
import graft.datasets.CachedDataset
import graft.operators.Records
import graft.protocol._

/**
 * User-facing facade: the Spark-native analog of the reference's
 * `Source.read(cache, ...)` → `ReadResult` → `result[stream]` flow
 * (`airbyte/sources/base.py:838-916`, `airbyte/results.py:32-144`).
 *
 * A Source here is anything that can produce a protocol message stream or
 * per-stream record frames. `JsonlSource` consumes the Airbyte wire
 * format (one protocol message per line — what a connector subprocess
 * writes to stdout); `FrameSource` adapts already-loaded DataFrames
 * (e.g. parquet scans) for testing and bulk loads.
 */
trait Source {
  def name: String
  def catalog: ConfiguredCatalog

  /** Record payload JSONL per selected stream. */
  def recordJsonl(spark: SparkSession, stream: String): Dataset[String]

  /**
   * Run the ELT pipeline: for each selected stream, normalize records to
   * the declared schema + metadata columns and finalize into the cache
   * with the resolved write strategy. Returns the read result.
   */
  def read(
      cache: SparkCache,
      spark: SparkSession,
      streams: Seq[String] = Seq.empty,
      writeStrategy: WriteStrategy = WriteStrategy.Auto,
      forceFullRefresh: Boolean = false): ReadResult = {
    val selected = if (streams.isEmpty) catalog.streamNames else streams
    cache.preRegisterStreams(selected) // one append job, not one per stream
    selected.foreach { s =>
      val jsonl = recordJsonl(spark, s)
      val declared = catalog(s).parseSchema
      val normalized = Records.normalize(jsonl, declared)
      val strategy =
        if (forceFullRefresh) WriteStrategy.Replace else writeStrategy
      cache.writeStream(s, normalized, catalog, strategy)
    }
    new ReadResult(cache, selected)
  }
}

/** Result mapping stream name → CachedDataset (reference ReadResult).
  * Per-stream row tallies (A5 progress counters) are computed lazily —
  * one count job per stream on first access, not per write. */
final class ReadResult(val cache: SparkCache, val streamNames: Seq[String]) {
  lazy val counts: Map[String, Long] =
    streamNames.map(s => s -> cache.table(s).count()).toMap
  def apply(stream: String): CachedDataset = new CachedDataset(cache, stream)
  def contains(stream: String): Boolean = streamNames.contains(stream)
}

/** Source over Airbyte-protocol JSONL files/datasets (S1/S3). */
final class JsonlSource(
    val name: String,
    val catalog: ConfiguredCatalog,
    lines: SparkSession => Dataset[String]) extends Source {

  /** Record payloads for one stream, filtered out of the message mix.
    * Line-level protocol filtering happens distributed (executors parse
    * only the envelope, with the record payload left as raw JSON). */
  override def recordJsonl(spark: SparkSession, stream: String): Dataset[String] = {
    import spark.implicits._
    val all = lines(spark)
    all.mapPartitions { it =>
      it.flatMap { line =>
        AirbyteMessage.parse(line) match {
          case Some(m) if m.messageType == MessageType.RECORD &&
            m.streamName.exists(_.equalsIgnoreCase(stream)) => m.dataJson
          case _ => None
        }
      }
    }
  }

  /** Hot-path override: one codegen'd envelope parse per line
    * (`Records.normalizeProtocol`) instead of recordJsonl's Jackson
    * pass + second `from_json` — same projection semantics, half the
    * JSON decoding. `recordJsonl` stays for the raw-payload surface
    * (S3 message iterators). */
  override def read(
      cache: SparkCache,
      spark: SparkSession,
      streams: Seq[String],
      writeStrategy: WriteStrategy,
      forceFullRefresh: Boolean): ReadResult = {
    val selected = if (streams.isEmpty) catalog.streamNames else streams
    cache.preRegisterStreams(selected)
    selected.foreach { s =>
      val normalized = Records.normalizeProtocol(lines(spark), s, catalog(s).parseSchema)
      val strategy =
        if (forceFullRefresh) WriteStrategy.Replace else writeStrategy
      cache.writeStream(s, normalized, catalog, strategy)
    }
    new ReadResult(cache, selected)
  }
}

/** Source over pre-loaded DataFrames (tests, parquet bulk loads). */
final class FrameSource(
    val name: String,
    val catalog: ConfiguredCatalog,
    frames: Map[String, SparkSession => DataFrame]) extends Source {

  override def recordJsonl(spark: SparkSession, stream: String): Dataset[String] = {
    import spark.implicits._
    val df = frames(stream)(spark)
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("j")).as[String]
  }

  /** Short-circuit: frames skip the JSONL round trip for bulk loads while
    * keeping identical projection semantics. */
  override def read(
      cache: SparkCache,
      spark: SparkSession,
      streams: Seq[String],
      writeStrategy: WriteStrategy,
      forceFullRefresh: Boolean): ReadResult = {
    val selected = if (streams.isEmpty) catalog.streamNames else streams
    cache.preRegisterStreams(selected)
    selected.foreach { s =>
      val df = frames(s)(spark)
      val declared = catalog(s).parseSchema
      val shaped =
        if (declared.fields.nonEmpty) Records.project(df, declared) else df
      val normalized = Records.addMetadata(shaped)
      val strategy =
        if (forceFullRefresh) WriteStrategy.Replace else writeStrategy
      cache.writeStream(s, normalized, catalog, strategy)
    }
    new ReadResult(cache, selected)
  }
}
