package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup

/** Incremental streaming near-dup: batches dedup within themselves and
  * against everything already admitted, without re-hashing history.
  * The signature index is a persistent band_key-bucketed table: folds
  * APPEND exactly the survivors' signature rows (cost ∝ batch, pinned
  * below) and a new StreamingDedup on the same table resumes. */
class StreamingDedupSpec extends SparkTestBase {

  import spark.implicits._

  // shingle=3 word 3-grams; these pairs share most of their shingles
  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val nearBase = "the quick brown fox jumps over the lazy dog again and once"
  private val other = "completely different content with no overlap whatsoever in this text"
  private val nearOther = "completely different content with no overlap whatsoever in that text"
  private val fresh = "entirely novel third document body that matches nothing else here today"

  private def freshTable(name: String): String = {
    // the index and its companion params table travel together
    Seq(name, name + "_params").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a fresh JVM's in-memory catalog cannot DROP tables left by a
      // prior JVM — clear the physical location too (the SparkCache.fresh
      // convention)
      val warehouse = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (warehouse.exists()) rm(warehouse)
    }
    name
  }

  test("batch processing: intra-batch then cross-batch dedup, index grows only by survivors") {
    val tbl = freshTable("sdd_spec_batch")
    val dedup = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)

    // batch 1: base + its near-dup + other → near pair collapses to min id
    val b1 = Seq((1L, base), (2L, nearBase), (3L, other)).toDF("doc_id", "text")
    val s1 = dedup.processBatch(b1).select("doc_id").as[Long].collect().sorted
    assert(s1.toSeq == Seq(1L, 3L), "near-dup of doc 1 must drop within the batch")
    assert(dedup.indexedDocs(spark) == 2L)

    // batch 2: re-delivery of a batch-1 near-dup + one novel doc
    val b2 = Seq((10L, nearOther), (11L, fresh)).toDF("doc_id", "text")
    val s2 = dedup.processBatch(b2).select("doc_id").as[Long].collect().sorted
    assert(s2.toSeq == Seq(11L), "doc 10 near-dups doc 3 from batch 1")
    assert(dedup.indexedDocs(spark) == 3L)

    // batch 3: near-dups of both earlier corpora → everything drops
    val b3 = Seq((20L, base), (21L, fresh)).toDF("doc_id", "text")
    val s3 = dedup.processBatch(b3).select("doc_id").as[Long].collect()
    assert(s3.isEmpty, "exact re-deliveries of admitted docs must drop")
    assert(dedup.indexedDocs(spark) == 3L, "dropped docs must not enter the index")
  }

  test("fold cost is append-only: index row delta == survivors' signature rows, never a rewrite") {
    val tbl = freshTable("sdd_spec_cost")
    val bands = 3
    val dedup = new StreamingDedup("doc_id", "text", threshold = 0.5,
      bands = bands, indexTable = tbl)

    dedup.processBatch(Seq((1L, base), (2L, other)).toDF("doc_id", "text"))
    val afterB1 = dedup.indexRows(spark)
    assert(afterB1 == 2L * bands, "two survivors x bands rows")

    // a batch with ONE novel doc must append exactly `bands` rows no
    // matter how much history the index holds — the ∝-batch contract
    dedup.processBatch(Seq((5L, fresh)).toDF("doc_id", "text"))
    assert(dedup.indexRows(spark) - afterB1 == bands.toLong,
      "fold wrote more than the new survivor's signature rows")

    // a batch of only duplicates appends nothing
    val before = dedup.indexRows(spark)
    dedup.processBatch(Seq((9L, base)).toDF("doc_id", "text"))
    assert(dedup.indexRows(spark) == before, "duplicate-only batch must not grow the index")
  }

  test("restart-resume: a new instance on the same table keeps deduping against history") {
    val tbl = freshTable("sdd_spec_resume")
    val first = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    first.processBatch(Seq((1L, base), (2L, other)).toDF("doc_id", "text"))
    assert(first.indexedDocs(spark) == 2L)

    // simulate a restart: fresh object, same table
    val resumed = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    assert(resumed.indexedDocs(spark) == 2L, "index must survive the instance")
    val s = resumed.processBatch(
      Seq((30L, nearBase), (31L, fresh)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().sorted
    assert(s.toSeq == Seq(31L), "resumed instance must still drop near-dups of pre-restart docs")
    assert(resumed.indexedDocs(spark) == 3L)
  }

  test("resume with mismatched signature parameters fails fast") {
    val tbl = freshTable("sdd_spec_mismatch")
    val first = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    first.processBatch(Seq((1L, base)).toDF("doc_id", "text"))

    // different numHashes/bands → signatures not comparable → refuse
    val wrong = new StreamingDedup("doc_id", "text", threshold = 0.5,
      numHashes = 12, bands = 4, indexTable = tbl)
    val ex = intercept[IllegalArgumentException] {
      wrong.processBatch(Seq((2L, fresh)).toDF("doc_id", "text"))
    }
    assert(ex.getMessage.contains("not") && ex.getMessage.contains(tbl),
      s"error must name the table and the incompatibility: ${ex.getMessage}")
    // a different threshold alone is also a mismatch (band width differs)
    intercept[IllegalArgumentException] {
      new StreamingDedup("doc_id", "text", threshold = 0.8, indexTable = tbl)
        .processBatch(Seq((3L, fresh)).toDF("doc_id", "text"))
    }
    // the index was not corrupted by the refused folds
    assert(first.indexedDocs(spark) == 1L)
    // and a correctly-parameterized resume still works
    val ok = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    val s = ok.processBatch(Seq((4L, fresh)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect()
    assert(s.toSeq == Seq(4L))
  }

  test("stale params row with no index (failed first batch) is adopted, not refused") {
    val tbl = freshTable("sdd_spec_stale")
    // simulate a first batch that died between recording params and
    // writing any signatures: params row exists, index table does not
    Seq((128, 16, 3, 0.9)).toDF("num_hashes", "bands", "shingle", "threshold")
      .write.saveAsTable(tbl + "_params")
    // a retry under CORRECTED parameters must proceed — there are no
    // signatures to be incompatible with
    val retry = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    val s = retry.processBatch(Seq((1L, base)).toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect()
    assert(s.toSeq == Seq(1L))
    // and the params table now records the retry's parameters
    val (h, b, sh, t) = spark.table(tbl + "_params")
      .select("num_hashes", "bands", "shingle", "threshold")
      .as[(Int, Int, Int, Double)].head()
    assert((h, b, sh, t) != ((128, 16, 3, 0.9)))
  }

  test("index table without a params record is refused, not guessed at") {
    val tbl = freshTable("sdd_spec_foreign")
    // fabricate a foreign index table with the right shape but no meta
    Seq((1L, 0, "k"))
      .toDF("id", "band", "band_key")
      .write.saveAsTable(tbl)
    val dedup = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    intercept[IllegalStateException] {
      dedup.processBatch(Seq((9L, fresh)).toDF("doc_id", "text"))
    }
  }

  test("foreachBatch harness: novel docs flow to the sink across micro-batches") {
    val tbl = freshTable("sdd_spec_stream")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, base), (2L, nearBase))
    val dedup = new StreamingDedup("doc_id", "text", threshold = 0.5, indexTable = tbl)
    val seen = mutable.ArrayBuffer.empty[Long]
    val q = dedup.start(
      input.toDF().toDF("doc_id", "text"),
      batch => seen.synchronized {
        seen ++= batch.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
      })
    try {
      q.processAllAvailable()
      input.addData((5L, base), (6L, fresh))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.sorted == Seq(1L, 6L),
      s"expected only novel docs 1 and 6, got ${seen.sorted}")
  }
}
