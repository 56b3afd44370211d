package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Training-shard export: pack a corpus into size-budgeted tar shards
 * (the WebDataset consumption shape — sequential archives a data
 * loader streams without random access). Shard assignment is a
 * DISTRIBUTED exclusive prefix sum of payload bytes in id order —
 * the q75 two-phase pattern: per-bucket totals (dimension-sized
 * collect) fan exclusive offsets back, within-bucket running sums
 * stay parallel — so no global single-partition window exists at any
 * scale. Shards then assemble per-group ([[TarArchive.write]] is
 * deterministic: mtime 0, fixed mode ⇒ byte-identical re-runs), and
 * the manifest is read BACK from the archive bytes ([[TarArchive.read]]),
 * so the correctness gate covers the container round-trip, not just
 * the assignment arithmetic.
 */
object ShardExport {

  final case class ShardManifest(
      shard_id: Long, n_docs: Long, payload_bytes: Long, tar_bytes: Long,
      first_doc: Long, last_doc: Long)

  /** Assign each row to a shard: shard = ⌊(bytes before it in id
    * order) / budget⌋. Buckets of 64 ids parallelize the running sum. */
  def assignShards(df: DataFrame, idCol: String, payloadCol: String,
      budgetBytes: Long): DataFrame = {
    val spark = df.sparkSession
    val sized = df.select(col(idCol).cast(LongType).as("doc_id"),
        col(payloadCol).as("payload"),
        octet_length(col(payloadCol)).cast(LongType).as("len"))
      .withColumn("bucket", (col("doc_id") / 64).cast(LongType))
      .localCheckpoint() // read by the totals collect AND the window pass
                         // — one source scan, not two
    val totals = sized.groupBy(col("bucket")).agg(sum(col("len")).as("blen"))
      .orderBy(col("bucket")).collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("bucket", "offset")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized.join(broadcast(offDf), Seq("bucket"))
      .withColumn("cum", sum(col("len")).over(w) + col("offset"))
      .withColumn("shard_id",
        ((col("cum") - col("len")) / budgetBytes).cast(LongType))
      .select(col("doc_id"), col("payload"), col("len"), col("shard_id"))
  }

  /** Pack → tar per shard → parse the archive bytes back → manifest.
    * Entry names are `doc_<id>.txt`; first/last ids in the manifest
    * come from the PARSED names, so a reader defect fails the gate. */
  def shardManifest(df: DataFrame, idCol: String, payloadCol: String,
      budgetBytes: Long): Dataset[ShardManifest] = {
    implicit val enc: Encoder[ShardManifest] = Encoders.product[ShardManifest]
    val assigned = assignShards(df, idCol, payloadCol, budgetBytes)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    assigned.select(col("shard_id"), col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val entries = rows.toSeq.sortBy(_._2).map { case (_, id, text) =>
          TarArchive.Entry(s"doc_$id.txt", text.getBytes("UTF-8"))
        }
        val tar = TarArchive.write(entries)
        val parsed = TarArchive.read(tar).getOrElse(
          throw new IllegalStateException(s"shard $shard failed to re-parse"))
        val ids = parsed.map(e =>
          e.name.stripPrefix("doc_").stripSuffix(".txt").toLong)
        ShardManifest(shard, parsed.size.toLong,
          parsed.map(_.data.length.toLong).sum, tar.length.toLong,
          ids.min, ids.max)
      }
  }
}
