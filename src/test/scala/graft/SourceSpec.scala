package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.datasets.Documents
import graft.protocol._
import graft.sources.{FrameSource, JsonlSource}

/** End-to-end facade: source.read(cache) → ReadResult → dataset surface
  * (the reference's §3.1/§3.3 lifecycles). */
class SourceSpec extends SparkTestBase {

  import spark.implicits._

  private val usersSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DecimalType(38, 9))))

  private val catalog = ConfiguredCatalog(Seq(
    ConfiguredStream("users", usersSchema, primaryKeys = Seq("id"))))

  test("dead-letter routing: malformed payloads split to rejects, good rows survive") {
    val jsonl = Seq(
      """{"id": 1, "name": "ok", "score": 1.5}""",
      """not json at all""",
      """{"id": 2, "name": "also-ok", "score": 2.5}""",
      """{"id": 3, "name": "trailing garbage"!!!}""").toDS()
    val (good, bad) = graft.operators.Records.normalizeWithRejects(
      jsonl, usersSchema,
      Some(lit("2020-01-01 00:00:00").cast(TimestampType)))
    val ids = good.select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
    assert(good.columns.contains("_airbyte_raw_id"))
    val rejects = bad.select("raw", "reject_reason").as[(String, String)].collect()
    assert(rejects.length == 2)
    assert(rejects.forall(_._2 == "JSON_PARSE_ERROR"))
    assert(rejects.map(_._1).exists(_.contains("not json")))
  }

  test("JsonlSource: protocol lines → cache tables → CachedDataset") {
    val lines = Seq(
      """{"type":"RECORD","record":{"stream":"users","data":{"id":1,"name":"a","score":1.5},"emitted_at":1700000000000}}""",
      """{"type":"RECORD","record":{"stream":"users","data":{"id":2,"name":"b","score":2.5,"extra":"pruned"},"emitted_at":1700000000000}}""",
      """{"type":"STATE","state":{"type":"STREAM","stream":{"stream_descriptor":{"name":"users"}}}}""",
      """garbage line""",
      """{"type":"RECORD","record":{"stream":"other","data":{"id":9},"emitted_at":0}}""")
    val src = new JsonlSource("test-src", catalog,
      s => { import s.implicits._; s.createDataset(lines) })
    val cache = SparkCache.fresh(spark, "graft_test_src")
    val result = src.read(cache, spark)

    assert(result.contains("users"))
    val ds = result("users")
    assert(ds.count() == 2)
    // declared-schema projection: pruned extras, metadata columns present
    assert(ds.columnNames == Seq("id", "name", "score"))
    assert(ds.toDF.columns.contains("_airbyte_raw_id"))
    // filter surface is chainable + lazy
    assert(ds.withFilter("id = 1").withFilter(col("name") === "a").count() == 1)
    cache.dropAll()
  }

  test("FrameSource merge re-read is idempotent via AUTO strategy") {
    val frames = Map("users" -> ((s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq((1L, "a", BigDecimal(1.5)), (2L, "b", BigDecimal(2.5)))
        .toDF("id", "name", "score")
    }))
    val src = new FrameSource("frames", catalog, frames)
    val cache = SparkCache.fresh(spark, "graft_test_frames")
    src.read(cache, spark, Seq.empty, WriteStrategy.Auto, forceFullRefresh = false)
    val r2 = src.read(cache, spark, Seq.empty, WriteStrategy.Auto, forceFullRefresh = false)
    assert(r2("users").count() == 2) // merge by PK, not append-doubling
    cache.dropAll()
  }

  test("document rendering: title, sections, frontmatter (reference F8)") {
    val df = Seq((1L, "Intro", "Hello world", "en"))
      .toDF("id", "title", "body", "lang")
    val docs = Documents.render(df, "title", Seq("body"),
      metadataCols = Seq("lang"), renderMetadata = true).collect()
    assert(docs.length == 1)
    val d = docs(0)
    assert(d.id == "Intro")
    assert(d.content.startsWith("---\nlang: en\n---\n"))
    assert(d.content.contains("# Intro\n"))
    assert(d.content.contains("## Body\n\nHello world"))
  }
}
