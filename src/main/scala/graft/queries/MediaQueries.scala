package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Multimodal, ShardExport}
import graft.sources.Tables

/**
 * Media queries over REAL binary decode paths. Unlike the q40/q148
 * header-metadata family, these run full pixel / sample decodes:
 * [[graft.operators.ImageCodec]] (PNG: zlib inflate + all five
 * defilters, pure JVM) and [[graft.operators.AudioHeaders.pcm16Samples]]
 * (16-bit PCM from the RIFF data chunk).
 *
 * Oracle strategy: every payload is synthesized from an integer
 * formula of the row id, written as a GENUINE container (deflate,
 * CRCs, filters, chunk layout), then decoded back from the bytes —
 * Spark never short-circuits through the formula. DuckDB recomputes
 * the expected statistics from the formula alone, so a defect anywhere
 * in encode → compress → decode → defilter → measure shows up as an
 * oracle mismatch. (Reference scope: PyAirbyte carries media as opaque
 * bytes — `airbyte/records.py` type failover; the decode stage is the
 * training-data extension this engine adds.)
 *
 * Scale notes: synthesis + decode are per-row kernels behind
 * `mapPartitions` (zero shuffle, one codec context per partition);
 * the image near-dup join moves only 64-bit hashes — 4 pigeonhole
 * bands of 16 bits each guarantee every pair within Hamming ≤ 4
 * collides on ≥1 band (radius 4 < 5 bands would need ≥5; with 4 bands
 * a pair ≤ 4 apart still shares a band only if some band is clean —
 * ≤4 errors across 4 bands CAN touch all 4, so we band the hash AND
 * verify candidates; identical-content classes always collide on all
 * bands, which is the recall case the corpus construction exercises).
 */
object MediaQueries {

  // ------------------------------------------------------------------
  // q166: PNG decode statistics. Gray gradient images g(x,y) =
  // (A·x+B·y+C) mod 256 per doc; encoder cycles scanline filters
  // (y mod 5), so this corpus exercises None/Sub/Up/Average/Paeth on
  // every image. Decode → integer mean/min/max — the brightness
  // screen of an image curation stage.
  // ------------------------------------------------------------------
  def q166ImageDecode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 250)
    val media = Multimodal.synthPng(docs, "doc_id")
    Multimodal.decodeImageStats(media).toDF()
      .select(col("media_id"), col("width"), col("height"), col("n_px"),
        col("mean_g"), col("min_g"), col("max_g"))
  }

  val q166Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(24 + (doc_id % 4) * 8 AS INT) AS w,
      |    CAST(16 + (doc_id % 3) * 8 AS INT) AS h,
      |    1 + doc_id % 7 AS A, 2 + doc_id % 5 AS B, doc_id % 256 AS C
      |  FROM documents WHERE doc_id < 250),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h,
      |    ((d.A * x.range + d.B * y.range + d.C) % 256) AS g
      |  FROM d
      |  JOIN range(48) x ON x.range < d.w
      |  JOIN range(32) y ON y.range < d.h)
      |SELECT doc_id AS media_id, MIN(w) AS width, MIN(h) AS height,
      |  CAST(COUNT(*) AS BIGINT) AS n_px,
      |  CAST(SUM(g) // COUNT(*) AS BIGINT) AS mean_g,
      |  CAST(MIN(g) AS INT) AS min_g, CAST(MAX(g) AS INT) AS max_g
      |FROM px GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q167: image near-duplicate pairs via perceptual hash. Seed-classed
  // noise PNGs (id mod 40 → byte-identical content; RGB/RGBA alternate
  // by seed parity) → decode → gray → dHash64 → 4×16-bit pigeonhole
  // band join → bit_count(XOR) ≤ 4 verify. Only (media_id, hash) rows
  // ever shuffle — payload bytes stay in their scan partitions. The
  // oracle derives the expected pair set from the class construction;
  // distinct-class dHashes are ~32 bits apart (iid noise), so a false
  // pair needs a ≤4-Hamming collision of independent 64-bit hashes
  // (P ≈ 6·10⁻¹⁴ per pair) — the gate fails loudly if decode or
  // hashing drifts.
  // ------------------------------------------------------------------
  def q167ImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 240)
    val media = Multimodal.synthNoisePng(docs, "doc_id", classes = 40)
    dhashPairs(media)
  }

  // ------------------------------------------------------------------
  // q178: perceptual near-dup across brightness-perturbed variants —
  // the case EXACT dedup provably misses: copies of the same image
  // content alternate a +4 global brightness shift, so their PNG bytes
  // (and any content hash) differ, but the area-average dHash is
  // shift-invariant (every cell mean and the global mean move by
  // exactly +4), so the perceptual pipeline still pairs them. Same
  // banded plan as q167; the oracle's expected pair set is again the
  // class construction.
  // ------------------------------------------------------------------
  def q178PerturbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 240)
    val media = Multimodal.synthNoisePng(docs, "doc_id", classes = 40,
      perturbBrightness = true)
    dhashPairs(media)
  }

  val q178Sql: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM documents a JOIN documents b
      |  ON a.doc_id % 40 = b.doc_id % 40 AND a.doc_id < b.doc_id
      |WHERE a.doc_id < 240 AND b.doc_id < 240""".stripMargin

  /** Decode → dHash → 5-band pigeonhole join (13/13/13/13/12 bits) →
    * popcount ≤ 4 verify; only (media_id, hash) rows ever shuffle.
    * Five bands, not four: pigeonhole over 4 bands only guarantees a
    * clean shared band up to distance 3, so a true pair with exactly
    * 4 differing bits spread one per band would never collide; with 5
    * bands every pair within the verify radius 4 is guaranteed a
    * collision (advisor finding, round 4). */
  private def dhashPairs(media: DataFrame): DataFrame =
    dhashBandPairs(Multimodal.decodeImageHashes(media).toDF()
      .select(col("media_id"), col("dhash")).localCheckpoint())

  /** Band join + verify over a prepared (media_id, dhash) frame —
    * split out so the spec can pin recall on adversarial bit spreads. */
  private[graft] def dhashBandPairs(hashes: DataFrame): DataFrame = {
    val bandBits = Seq(13, 13, 13, 13, 12)
    val offsets = bandBits.scanLeft(0)(_ + _).init
    val banded = hashes.select(col("media_id"), col("dhash"),
        explode(array(bandBits.indices.map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("dhash"), offsets(b))
              .bitwiseAND(lit((1L << bandBits(b)) - 1)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("media_id").as("id_a"), col("dhash").as("h_a"))
    val b = banded.select(col("band"), col("key"),
      col("media_id").as("id_b"), col("dhash").as("h_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 4)
      .select(col("id_a"), col("id_b"))
  }

  val q167Sql: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM documents a JOIN documents b
      |  ON a.doc_id % 40 = b.doc_id % 40 AND a.doc_id < b.doc_id
      |WHERE a.doc_id < 240 AND b.doc_id < 240""".stripMargin

  // ------------------------------------------------------------------
  // q168: audio frame energy / zero-crossing screen. 16-bit mono PCM
  // WAVs with s(i) = ((id·31 + i·17) mod 2001) − 1000; samples decoded
  // from the RIFF data chunk, framed at 256, integer mean-square
  // energy and within-frame sign changes per frame, aggregated per
  // payload. The silence/energy filter of audio curation on real
  // container bytes.
  // ------------------------------------------------------------------
  def q168AudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val media = Multimodal.synthPcmWav(docs, "doc_id")
    Multimodal.audioFrameStats(media).toDF()
      .select(col("media_id"), col("n_frames"), col("sum_rms2"),
        col("max_rms2"), col("total_zc"))
  }

  // ------------------------------------------------------------------
  // q172: thumbnail pipeline — decode → exact area-average resize to
  // 8×6 → re-encode → decode again → every thumbnail pixel, over the
  // q166 gradient corpus. The oracle re-derives each cell as the
  // truncating mean of its pixel block (pixels join cells by the
  // explicit ⌊j·w/8⌋ boundaries — the same partition the kernel uses),
  // so resize AND the second encode/decode round-trip are gated
  // per-pixel. Zero-shuffle per-row kernel chain.
  // ------------------------------------------------------------------
  def q172Thumbnail(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 120)
    val media = Multimodal.synthPng(docs, "doc_id")
    Multimodal.thumbnailPixels(media, outW = 8, outH = 6).toDF()
      .select(col("media_id"), col("ci"), col("g"))
  }

  val q172Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(24 + (doc_id % 4) * 8 AS INT) AS w,
      |    CAST(16 + (doc_id % 3) * 8 AS INT) AS h,
      |    1 + doc_id % 7 AS A, 2 + doc_id % 5 AS B, doc_id % 256 AS C
      |  FROM documents WHERE doc_id < 120),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, x.range AS x, y.range AS y,
      |    ((d.A * x.range + d.B * y.range + d.C) % 256) AS g
      |  FROM d
      |  JOIN range(48) x ON x.range < d.w
      |  JOIN range(32) y ON y.range < d.h),
      |cells AS (
      |  SELECT p.doc_id, CAST(i.range * 8 + j.range AS INT) AS ci,
      |    CAST(SUM(p.g) // COUNT(*) AS INT) AS g
      |  FROM px p
      |  JOIN range(8) j ON p.x >= (j.range * p.w) // 8
      |                 AND p.x < ((j.range + 1) * p.w) // 8
      |  JOIN range(6) i ON p.y >= (i.range * p.h) // 6
      |                 AND p.y < ((i.range + 1) * p.h) // 6
      |  GROUP BY p.doc_id, i.range, j.range)
      |SELECT doc_id AS media_id, ci, g FROM cells""".stripMargin

  // ------------------------------------------------------------------
  // q177: multimodal curation capstone — the q100/q137 pattern over
  // the REAL decode paths. Every doc (doc_id < 240) carries an image
  // (gradient PNG) and an audio track (PCM WAV); curation keeps docs
  // whose decoded image brightness sits in [100, 180], whose decoded
  // audio peaks at ≥ 120k mean-square energy, and whose text has ≥ 40
  // tokens; survivors collapse into exact-duplicate content classes
  // (canonical = min doc_id). Per lang: candidates, pass counts per
  // gate, survivors, distinct classes, canonical token volume. The
  // oracle recomputes image/audio gates per-pixel/per-sample from the
  // synthesis formulas — so this gate fails if ANY stage of either
  // decode chain drifts. All stages are the already-audited plans:
  // per-row kernels + one doc_id-keyed join + class agg + lang tally.
  // ------------------------------------------------------------------
  def q177MediaCuration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 240)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ")).cast(LongType).as("toks"))
    val img = Multimodal.decodeImageStats(
        Multimodal.synthPng(docs, "doc_id")).toDF()
      .select(col("media_id").as("doc_id"), col("mean_g"))
    val aud = Multimodal.audioFrameStats(
        Multimodal.synthPcmWav(docs, "doc_id")).toDF()
      .select(col("media_id").as("doc_id"), col("max_rms2"))
    val gated = docs.join(img, Seq("doc_id")).join(aud, Seq("doc_id"))
      .withColumn("img_ok", col("mean_g") >= 100 && col("mean_g") <= 180)
      .withColumn("aud_ok", col("max_rms2") >= 120000L)
      .withColumn("txt_ok", col("toks") >= 40)
      .localCheckpoint() // read by the tally AND the survivor classes
    val classes = gated
      .filter(col("img_ok") && col("aud_ok") && col("txt_ok"))
      .groupBy(col("lang"), col("text"))
      .agg(min(col("doc_id")).as("canonical"), max(col("toks")).as("ctoks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_classes"), sum(col("ctoks")).as("class_tokens"))
    gated.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("img_ok"), 1L).otherwise(0L)).as("n_img_ok"),
        sum(when(col("aud_ok"), 1L).otherwise(0L)).as("n_aud_ok"),
        sum(when(col("txt_ok"), 1L).otherwise(0L)).as("n_txt_ok"),
        sum(when(col("img_ok") && col("aud_ok") && col("txt_ok"), 1L)
          .otherwise(0L)).as("n_kept"))
      .join(classes, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_candidates"), col("n_img_ok"),
        col("n_aud_ok"), col("n_txt_ok"), col("n_kept"),
        coalesce(col("n_classes"), lit(0L)).as("n_classes"),
        coalesce(col("class_tokens"), lit(0L)).as("class_tokens"))
  }

  val q177Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
      |    CAST(24 + (doc_id % 4) * 8 AS INT) AS w,
      |    CAST(16 + (doc_id % 3) * 8 AS INT) AS h,
      |    1 + doc_id % 7 AS A, 2 + doc_id % 5 AS B, doc_id % 256 AS C,
      |    CAST(1024 + (doc_id % 4) * 256 AS INT) AS ns
      |  FROM documents WHERE doc_id < 240),
      |img AS (
      |  SELECT doc_id, CAST(SUM(g) // COUNT(*) AS BIGINT) AS mean_g FROM (
      |    SELECT d.doc_id AS doc_id,
      |      ((d.A * x.range + d.B * y.range + d.C) % 256) AS g
      |    FROM d
      |    JOIN range(48) x ON x.range < d.w
      |    JOIN range(32) y ON y.range < d.h)
      |  GROUP BY doc_id),
      |fr AS (
      |  SELECT doc_id, f, CAST(SUM(s * s) // 256 AS BIGINT) AS rms2 FROM (
      |    SELECT d.doc_id AS doc_id, i.range // 256 AS f,
      |      ((d.doc_id * 31 + i.range * 17) % 2001) - 1000 AS s
      |    FROM d JOIN range(1792) i ON i.range < d.ns)
      |  GROUP BY doc_id, f),
      |aud AS (SELECT doc_id, MAX(rms2) AS max_rms2 FROM fr GROUP BY doc_id),
      |gated AS (
      |  SELECT d.doc_id, d.lang, d.text, d.toks,
      |    img.mean_g >= 100 AND img.mean_g <= 180 AS img_ok,
      |    aud.max_rms2 >= 120000 AS aud_ok,
      |    d.toks >= 40 AS txt_ok
      |  FROM d JOIN img USING (doc_id) JOIN aud USING (doc_id)),
      |classes AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_classes,
      |    CAST(SUM(ctoks) AS BIGINT) AS class_tokens FROM (
      |    SELECT lang, text, MIN(doc_id) AS canonical, MAX(toks) AS ctoks
      |    FROM gated WHERE img_ok AND aud_ok AND txt_ok
      |    GROUP BY lang, text)
      |  GROUP BY lang)
      |SELECT g.lang, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |  CAST(SUM(CASE WHEN img_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_img_ok,
      |  CAST(SUM(CASE WHEN aud_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_aud_ok,
      |  CAST(SUM(CASE WHEN txt_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_txt_ok,
      |  CAST(SUM(CASE WHEN img_ok AND aud_ok AND txt_ok THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept,
      |  COALESCE(MAX(c.n_classes), 0) AS n_classes,
      |  COALESCE(MAX(c.class_tokens), 0) AS class_tokens
      |FROM gated g LEFT JOIN classes c ON c.lang = g.lang
      |GROUP BY g.lang""".stripMargin

  // ------------------------------------------------------------------
  // q171: training-shard export manifest. Docs pack into 16 KiB-budget
  // tar shards by a distributed exclusive prefix sum in doc_id order
  // (q75's two-phase pattern — no single-partition window); each shard
  // is a REAL deterministic ustar archive, and the manifest is read
  // back from the parsed archive bytes. The oracle re-derives shard
  // assignment (window cumsum // budget) and the exact ustar size
  // arithmetic (512-byte header + 512-padded payload per entry + two
  // trailer blocks), so writer and reader are both gated.
  // ------------------------------------------------------------------
  def q171ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 300)
    ShardExport.shardManifest(docs, "doc_id", "text", budgetBytes = 16384L)
      .toDF()
      .select(col("shard_id"), col("n_docs"), col("payload_bytes"),
        col("tar_bytes"), col("first_doc"), col("last_doc"))
  }

  val q171Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS len
      |  FROM documents WHERE doc_id < 300),
      |c AS (
      |  SELECT doc_id, len,
      |    SUM(len) OVER (ORDER BY doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len AS cum
      |  FROM d)
      |SELECT CAST(cum // 16384 AS BIGINT) AS shard_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len) AS BIGINT) AS payload_bytes,
      |  CAST(SUM(512 + ((len + 511) // 512) * 512) + 1024 AS BIGINT) AS tar_bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q179: JPEG decode statistics — real baseline JFIF payloads (the
  // format real crawls are dominated by) through the pure-JVM
  // [[graft.operators.JpegCodec]]. Solid-gray images are DC-only, so
  // the decode is EXACTLY the quantization round-trip
  // px' = clamp(round(round(8·(v−128)/Q0)·Q0/8)+128, 0, 255) with
  // Q0 ∈ {16, 8, 3} for quality ∈ {50, 75, 90} (the libjpeg Annex-K
  // scaling), which the oracle recomputes per row; non-multiple-of-8
  // sizes exercise the edge-clamped partial-MCU path. Per-row kernel,
  // zero shuffle — the same scan shape as q166's PNG decode.
  // ------------------------------------------------------------------
  def q179JpegDecode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val media = Multimodal.synthJpeg(docs, "doc_id")
    Multimodal.decodeImageStats(media).toDF()
      .select(col("media_id"), col("width"), col("height"), col("n_px"),
        col("mean_g"), col("min_g"), col("max_g"))
  }

  val q179Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(13 + (doc_id % 5) * 7 AS INT) AS w,
      |    CAST(9 + (doc_id % 3) * 8 AS INT) AS h,
      |    (37 * doc_id + 11) % 256 AS v,
      |    CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 8 ELSE 3 END AS q0
      |  FROM documents WHERE doc_id < 200),
      |px AS (
      |  SELECT doc_id, w, h,
      |    CAST(least(255, greatest(0,
      |      round(round(8.0 * (v - 128) / q0) * q0 / 8.0) + 128)) AS BIGINT) AS g
      |  FROM d)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px, g AS mean_g,
      |  CAST(g AS INT) AS min_g, CAST(g AS INT) AS max_g
      |FROM px""".stripMargin

  // ------------------------------------------------------------------
  // q180: CROSS-FORMAT image near-dup — the reason the media operators
  // dispatch on magic bytes: the same content stored once as PNG and
  // once as baseline JPEG must still collapse to one class. Content is
  // block-aligned two-tone (DC-only ⇒ the quality-75 JPEG round-trip
  // is EXACT, so decoded pixels are byte-identical across containers)
  // and class patterns are RM(1,4) codewords (pairwise half-image distance), so the expected
  // pair set is the class construction itself — same oracle shape as
  // q167/q178. Same scale story: only (media_id, 64-bit hash) rows
  // shuffle through the 5-band pigeonhole join.
  // ------------------------------------------------------------------
  def q180CrossFormatNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 210)
    val media = Multimodal.synthMixedFormat(docs, "doc_id", classes = 30)
    // aHash, not dHash: for block-solid content the difference hash is
    // mostly zero bits (adjacent cells equal inside blocks) and loses
    // the class separation; the average hash reproduces the RM pattern
    // exactly (cells are block-aligned, the global mean sits between
    // the tones), giving inter-class distance >= 32
    dhashBandPairs(Multimodal.decodeImageHashes(media).toDF()
      .select(col("media_id"), col("ahash").as("dhash")).localCheckpoint())
  }

  val q180Sql: String =
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM documents a JOIN documents b
      |  ON a.doc_id % 30 = b.doc_id % 30 AND a.doc_id < b.doc_id
      |WHERE a.doc_id < 210 AND b.doc_id < 210""".stripMargin

  // ------------------------------------------------------------------
  // q187: video-container metadata curation — build a REAL ISO-BMFF
  // (MP4) file per document ([[graft.operators.Mp4Headers.buildMp4]]:
  // ftyp/moov/mvhd/trak/mdia/hdlr/mdat, every 5th file using the
  // 64-bit largesize mdat form), parse it back through the recursive
  // box walk, and aggregate per (handler, timescale) — the
  // duration/track profile a video corpus is triaged by BEFORE any
  // frame decode. The oracle restates the construction arithmetic
  // (timescale table, duration ticks, integer ms division), so the
  // whole build→parse→aggregate loop is correctness-gated, including
  // the largesize and container-recursion paths.
  //
  // 100 TB: per-row kernels (build+parse never leave the partition)
  // feeding one map-side-combined hash-agg — the q148 shape.
  // ------------------------------------------------------------------
  def q187VideoMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthMp4(
      Tables.documents(spark, dir), "doc_id", "text")
    Multimodal.extractVideoFeatures(media).toDF()
      .groupBy(col("handler"), col("timescale"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_tracks").cast(LongType)).as("sum_tracks"),
        sum(col("duration_ms")).as("sum_duration_ms"),
        sum(col("mdat_bytes")).as("sum_mdat_bytes"))
  }

  // ------------------------------------------------------------------
  // q191: TIFF/EXIF metadata audit — build→parse round-trip through
  // the real IFD walk ([[graft.operators.TiffHeaders]]), both byte
  // orders in-corpus (every other file is "MM"), orientation histogram
  // + pixel tallies per (byte_order, orientation). Orientation is the
  // EXIF field image pipelines actually have to honor before training
  // (a rotation-unaware decode feeds transposed pixels). Per-row
  // kernels; ONE map-side-combined tally crosses the exchange. The
  // oracle recomputes the synthesis formulas — a parser that misreads
  // any IFD field diverges immediately.
  // ------------------------------------------------------------------
  def q191TiffMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthTiff(Tables.documents(spark, dir), "doc_id")
    Multimodal.extractTiffFeatures(media).toDF()
      .groupBy(col("byte_order"), col("orientation"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("width") * col("height")).as("sum_pixels"),
        sum(col("xres_num")).as("sum_xres"),
        max(col("width")).as("max_width"))
  }

  val q191Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |    16 + (doc_id % 8) * 16 AS w,
      |    16 + (doc_id % 5) * 32 AS h,
      |    1 + (doc_id % 8) AS orientation,
      |    72 + (doc_id % 3) * 72 AS xres
      |  FROM documents)
      |SELECT byte_order, CAST(orientation AS INT) AS orientation,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
      |  CAST(SUM(xres) AS BIGINT) AS sum_xres,
      |  CAST(MAX(w) AS BIGINT) AS max_width
      |FROM d GROUP BY 1, 2""".stripMargin

  val q187Sql: String =
    """WITH d AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |    CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
      |         WHEN 2 THEN 12288 ELSE 44100 END AS tscale,
      |    CASE WHEN doc_id % 3 = 0 THEN 'soun' ELSE 'vide' END AS handler,
      |    octet_length(encode(text)) * 25 + doc_id % 7 AS dur
      |  FROM documents)
      |SELECT handler, CAST(tscale AS BIGINT) AS timescale,
      |  COUNT(*) AS n_files,
      |  CAST(COUNT(*) AS BIGINT) AS sum_tracks,
      |  CAST(SUM(dur * 1000 // tscale) AS BIGINT) AS sum_duration_ms,
      |  CAST(SUM(len) AS BIGINT) AS sum_mdat_bytes
      |FROM d GROUP BY 1, 2""".stripMargin

  val q168Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1024 + (doc_id % 4) * 256 AS INT) AS n
      |  FROM documents WHERE doc_id < 200),
      |s AS (
      |  SELECT d.doc_id, i.range AS i, i.range // 256 AS f,
      |    ((d.doc_id * 31 + i.range * 17) % 2001) - 1000 AS s,
      |    ((d.doc_id * 31 + (i.range - 1) * 17) % 2001) - 1000 AS sp
      |  FROM d JOIN range(1792) i ON i.range < d.n),
      |fr AS (
      |  SELECT doc_id, f, CAST(SUM(s * s) // 256 AS BIGINT) AS rms2,
      |    CAST(SUM(CASE WHEN i % 256 <> 0 AND ((s >= 0) <> (sp >= 0))
      |      THEN 1 ELSE 0 END) AS BIGINT) AS zc
      |  FROM s GROUP BY 1, 2)
      |SELECT doc_id AS media_id, CAST(COUNT(*) AS INT) AS n_frames,
      |  CAST(SUM(rms2) AS BIGINT) AS sum_rms2,
      |  CAST(MAX(rms2) AS BIGINT) AS max_rms2,
      |  CAST(SUM(zc) AS BIGINT) AS total_zc
      |FROM fr GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q204: WebP container metadata curation — build a REAL RIFF/WebP
  // file per document ([[graft.operators.WebpHeaders]]), cycling
  // through all three variants (lossy VP8 frame tag, lossless VP8L
  // packed word, extended VP8X canvas + ANIM/ANMF animation chunks),
  // parse it back through the chunk walk, and profile the corpus per
  // (format, alpha). Frame and loop counts keep stills and animations
  // apart in image dedup; the declared RIFF size gates the writer's
  // chunk-length/padding arithmetic. The oracle restates the synthesis
  // formulas INCLUDING the container-size arithmetic, so both the
  // writer and all three dimension decoders are correctness-gated.
  //
  // 100 TB: per-row build→parse kernels feeding one map-side-combined
  // hash-agg — the q187/q191 shape.
  // ------------------------------------------------------------------
  def q204WebpMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthWebp(Tables.documents(spark, dir), "doc_id")
    Multimodal.extractWebpFeatures(media).toDF()
      .groupBy(col("format"), col("has_alpha"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("width") * col("height")).as("sum_pixels"),
        sum(col("n_frames").cast(LongType)).as("sum_frames"),
        sum(col("loop_count").cast(LongType)).as("sum_loops"),
        sum(col("riff_bytes")).as("sum_riff_bytes"),
        max(col("width")).as("max_width"))
  }

  val q204Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
      |         ELSE 'extended' END AS format,
      |    16 + (doc_id % 7) * 48 AS w,
      |    16 + (doc_id % 9) * 32 AS h,
      |    CASE WHEN doc_id % 3 = 0 THEN FALSE
      |         ELSE doc_id % 2 = 0 END AS has_alpha,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 4 ELSE 1 END AS frames,
      |    CASE WHEN doc_id % 3 = 2 THEN doc_id % 5 ELSE 0 END AS loops,
      |    doc_id % 50 AS extra
      |  FROM documents),
      |r AS (
      |  SELECT format, has_alpha, w, h, frames, loops,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 22 + extra + (extra % 2)
      |      WHEN 1 THEN 17 + extra + ((extra + 1) % 2)
      |      ELSE 36 + 46 * frames END AS riff
      |  FROM d)
      |SELECT format, has_alpha, COUNT(*) AS n_files,
      |  CAST(SUM(w * h) AS BIGINT) AS sum_pixels,
      |  CAST(SUM(frames) AS BIGINT) AS sum_frames,
      |  CAST(SUM(loops) AS BIGINT) AS sum_loops,
      |  CAST(SUM(riff) AS BIGINT) AS sum_riff_bytes,
      |  CAST(MAX(w) AS BIGINT) AS max_width
      |FROM r GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q213: PDF container metadata curation — build a REAL classic-xref
  // PDF per document ([[graft.operators.PdfHeaders]]: catalog, pages
  // tree, per-page media boxes, Info dictionary, byte-exact xref +
  // trailer), parse it back through the xref walk (every object
  // offset validated against its `i 0 obj` header), and profile the
  // corpus per (version, page size) — the triage every document-
  // extraction pipeline runs before rendering a page. The oracle
  // restates the synthesis formulas including the object-count
  // arithmetic, so writer and parser are both correctness-gated.
  //
  // 100 TB: per-row build→parse kernels feeding one map-side-combined
  // hash-agg — the q187/q191/q204 shape.
  // ------------------------------------------------------------------
  def q213PdfMeta(spark: SparkSession, dir: String): DataFrame = {
    // regex-heavy per-row parse: spread an under-partitioned input
    // (one parquet file = one split) across the cores; no-op at scale
    val docs = Tables.documents(spark, dir)
    val cores = spark.sparkContext.defaultParallelism
    val spread = if (docs.rdd.getNumPartitions * 2 < cores)
      docs.repartition(cores) else docs
    val media = Multimodal.synthPdf(spread, "doc_id")
    Multimodal.extractPdfFeatures(media).toDF()
      .groupBy(col("version"), col("box_w"), col("box_h"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_pages").cast(LongType)).as("sum_pages"),
        sum(col("n_objects").cast(LongType)).as("sum_objects"),
        sum(when(col("offsets_valid"), 1L).otherwise(0L)).as("n_valid"))
  }

  val q213Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN '1.4' ELSE '1.7' END AS version,
      |    CASE doc_id % 3 WHEN 0 THEN 612 WHEN 1 THEN 595 ELSE 420 END AS w,
      |    CASE doc_id % 3 WHEN 0 THEN 792 WHEN 1 THEN 842 ELSE 595 END AS h,
      |    1 + doc_id % 5 AS pages
      |  FROM documents)
      |SELECT version, CAST(w AS INT) AS box_w, CAST(h AS INT) AS box_h,
      |  COUNT(*) AS n_files,
      |  CAST(SUM(pages) AS BIGINT) AS sum_pages,
      |  CAST(SUM(pages + 3) AS BIGINT) AS sum_objects,
      |  CAST(COUNT(*) AS BIGINT) AS n_valid
      |FROM d GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------
  // q214: ZIP shard manifest with CRC audit — build a REAL
  // STORED-method ZIP per document ([[graft.operators.ZipHeaders]]:
  // local headers, central directory, EOCD, byte-exact offsets),
  // parse it back through the central-directory walk, and RE-COMPUTE
  // each entry's CRC-32 against the recorded value — the per-shard
  // corruption check an archive-ingest pipeline runs before
  // extraction (the ZIP complement of the tar manifest, q171). The
  // oracle recomputes entry counts and payload-size sums from the
  // synthesis formulas and pins mismatches at zero — a writer or
  // parser that corrupts one byte of layout flips a CRC or an offset
  // flag immediately.
  //
  // 100 TB: per-row build→parse kernels feeding one map-side-combined
  // hash-agg.
  // ------------------------------------------------------------------
  def q214ZipManifest(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthZip(Tables.documents(spark, dir), "doc_id")
    Multimodal.extractZipFeatures(media).toDF()
      .groupBy(col("n_entries"))
      .agg(count(lit(1)).as("n_archives"),
        sum(col("total_bytes")).as("sum_bytes"),
        sum(col("crc_mismatches").cast(LongType)).as("crc_mismatches"),
        sum(when(col("offsets_valid"), 1L).otherwise(0L)).as("n_valid"))
  }

  val q214Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS n_entries
      |  FROM documents),
      |e AS (
      |  SELECT d.doc_id, d.n_entries,
      |    10 + ((d.doc_id + j.range) % 50) AS len
      |  FROM d JOIN range(4) j ON j.range < d.n_entries)
      |SELECT n_entries, COUNT(DISTINCT doc_id) AS n_archives,
      |  CAST(SUM(len) AS BIGINT) AS sum_bytes,
      |  CAST(0 AS BIGINT) AS crc_mismatches,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_valid
      |FROM e GROUP BY 1""".stripMargin
}
