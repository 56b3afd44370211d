package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/**
 * Incremental near-dup filtering of a LIVE document stream — the
 * streaming face of the batch `Dedup` family: each micro-batch is
 * deduplicated within itself (MinHash-LSH, smaller id wins) and then
 * probed against the accumulated corpus SIGNATURE INDEX
 * ([[Dedup.signatureIndex]] / [[Dedup.probeNearDups]]) so history is
 * never re-hashed; survivors fold their own signatures into the index
 * and become the corpus later batches dedup against.
 *
 * State design for scale: the index is one row per (doc, band) of ids
 * + shingle sets only — NOT the documents — and lives as a DataFrame
 * re-`localCheckpoint`ed per fold here (lineage stays O(1) deep); on a
 * cluster the identical fold is an append to a band_key-bucketed index
 * table, making every probe join co-located. Per-batch work is
 * batch-vs-index, never corpus-vs-corpus: the cost of batch t is
 * |batch| × (collision rate), independent of t.
 *
 * The reference's closest surface is incremental sync with
 * deduplicating merge writes (`airbyte/shared/sql_processor.py`'s
 * merge-upsert path); this extends the same contract from exact-PK
 * identity to near-duplicate content identity.
 */
final class StreamingDedup(
    idCol: String, textCol: String,
    threshold: Double = 0.5,
    numHashes: Int = 9, bands: Int = 3, shingle: Int = 3) {

  @volatile private var index: Option[DataFrame] = None

  /** Distinct documents currently represented in the signature index. */
  def indexedDocs: Long =
    index.map(_.select("id").distinct().count()).getOrElse(0L)

  /**
   * One micro-batch: returns the surviving (novel) rows of `batch` and
   * folds their signatures into the index. Deterministic regardless of
   * batch partitioning: intra-batch near-dup classes keep their
   * smallest id; anything matching the corpus-so-far drops.
   */
  def processBatch(batch: DataFrame): DataFrame = {
    val cached = batch.localCheckpoint() // read 3×: pairs, probe, survivors
    // intra-batch: any id near-dupping a SMALLER id in the same batch
    val intraDrop = Dedup.minhashNearDups(
        cached, idCol, textCol, threshold, numHashes, bands, shingle)
      .select(col("id_b").as(idCol)).distinct()
    // cross-batch: any id near-dupping the accumulated corpus
    val crossDrop = index match {
      case Some(idx) =>
        Dedup.probeNearDups(cached, idx, idCol, textCol,
            threshold, numHashes, bands, shingle)
          .select(col("new_id").as(idCol)).distinct()
      case None => cached.select(col(idCol)).limit(0)
    }
    val survivors = cached
      .join(intraDrop.unionByName(crossDrop).distinct(), Seq(idCol), "left_anti")
      .localCheckpoint()
    val newEntries = Dedup.signatureIndex(
      survivors, idCol, textCol, numHashes, bands, shingle)
    index = Some(index match {
      case Some(idx) => idx.unionByName(newEntries).localCheckpoint()
      case None => newEntries.localCheckpoint()
    })
    survivors
  }

  /**
   * Attach to a streaming DataFrame: novel documents flow to `sink`
   * per micro-batch. `foreachBatch` is the right harness because the
   * index fold is a batch-side DataFrame operation (exactly how
   * Structured Streaming integrates non-windowed batch state).
   */
  def start(stream: DataFrame, sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(processBatch(batch))
      }
      .start()
}
