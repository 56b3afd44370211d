package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.datasets.TableStatistics
import graft.operators.Records
import graft.protocol._
import graft.sources.FrameSource

/** Whole-engine lifecycle in one flow: initial sync → incremental merge
  * → state checkpoint → maintenance (compaction) → statistics. The
  * parts are unit-tested elsewhere; this proves they compose. */
class LifecycleSpec extends SparkTestBase {

  import spark.implicits._

  test("sync → incremental merge → state → compaction → stats compose") {
    val cache = SparkCache.fresh(spark, "graft_test_lifecycle")
    val catalog = ConfiguredCatalog(Seq(
      ConfiguredStream("users", new StructType(), primaryKeys = Seq("id"),
        cursorField = Some("updated_at"))))

    // sync 1: initial load
    val batch1 = Seq(
      (1L, "alice", "2024-01-01"), (2L, "bob", "2024-01-01"),
      (3L, "carol", "2024-01-02")).toDF("id", "name", "updated_at")
    new FrameSource("crm", catalog, Map("users" -> ((_: org.apache.spark.sql.SparkSession) => batch1))).read(cache, spark)
    cache.writeState("crm", "users", """{"cursor":"2024-01-02"}""")
    assert(cache.table("users").count() == 3)

    // sync 2: cursor-filtered increment (2 updated + 1 new), merge last-wins
    val feed = Seq(
      (2L, "bob-v2", "2024-01-03"), (3L, "carol-v2", "2024-01-03"),
      (4L, "dave", "2024-01-04"),
      (1L, "alice-stale", "2024-01-01")).toDF("id", "name", "updated_at")
    val cursor = cache.latestState("crm", "users").get.split("\"")(3)
    val batch2 = feed.filter(col("updated_at") > cursor)
    new FrameSource("crm", catalog, Map("users" -> ((_: org.apache.spark.sql.SparkSession) => batch2))).read(cache, spark)
    cache.writeState("crm", "users", """{"cursor":"2024-01-04"}""")

    val after = cache.table("users")
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(after == Map(1L -> "alice", 2L -> "bob-v2", 3L -> "carol-v2", 4L -> "dave"))

    // maintenance: compact the accreted files; data must be unchanged
    val files = cache.compactTable("users")
    assert(files >= 1)
    val recheck = cache.table("users")
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(recheck == after)

    // statistics over the final table
    val stats = TableStatistics.collect(
      Records.dropInternalColumns(cache.table("users")))
    assert(stats.rowCount == 4)
    assert(stats.columns.find(_.name == "id").get.nullCount == 0)
    assert(cache.latestState("crm", "users").get.contains("2024-01-04"))
    cache.dropAll()
  }

  test("CLI sketch surface: update → persist → restore → shard merge") {
    val cache = SparkCache.fresh(spark, "graft_test_sketch_cli")
    // two "shards" of ids with overlap: 0..599 and 400..999
    spark.range(0, 600).toDF("uid")
      .write.mode("overwrite").saveAsTable("`graft_test_sketch_cli`.`shard_a`")
    spark.range(400, 1000).toDF("uid")
      .write.mode("overwrite").saveAsTable("`graft_test_sketch_cli`.`shard_b`")
    def sketch(kv: (String, String)*): String =
      graft.tools.Cli.runSketch(spark, cache, kv.toMap)

    // per-shard HLL update, persisted under distinct names
    val a = sketch("kind" -> "distinct", "name" -> "sk_a", "p" -> "12",
      "op" -> "update", "table" -> "shard_a", "column" -> "uid")
    val b = sketch("kind" -> "distinct", "name" -> "sk_b", "p" -> "12",
      "op" -> "update", "table" -> "shard_b", "column" -> "uid")
    assert(a.contains("sk_a") && b.contains("sk_b"))

    // a NEW run (restore path) merges the shards; the union estimate
    // must equal the single-sketch estimate over the union of keys
    val merged = sketch("kind" -> "distinct", "name" -> "sk_union",
      "p" -> "12", "op" -> "merge", "others" -> "sk_a,sk_b")
    val direct = {
      val sk = new graft.streaming.StreamingDistinct(12)
      sk.processBatch(spark.range(0, 1000).toDF("key"))
      sk.estimate
    }
    assert(merged.contains(s"estimate=$direct"),
      s"merged shard estimate must equal direct union estimate: $merged vs $direct")
    // show restores the persisted union without mutating it
    assert(sketch("kind" -> "distinct", "name" -> "sk_union", "p" -> "12",
      "op" -> "show") == merged)

    // bloom: update then probe members and non-members through the CLI line
    sketch("kind" -> "bloom", "name" -> "sk_bl", "p" -> "16", "k" -> "3",
      "op" -> "update", "table" -> "shard_a", "column" -> "uid")
    val probed = sketch("kind" -> "bloom", "name" -> "sk_bl", "p" -> "16",
      "k" -> "3", "op" -> "show", "probe" -> "5,599,123456789")
    assert(probed.contains("5=true") && probed.contains("599=true"),
      probed)

    // a non-numeric probe value goes through the CLI's fail() path
    // (usage-style IllegalArgumentException), never a raw
    // NumberFormatException
    val badProbe = intercept[IllegalArgumentException] {
      sketch("kind" -> "bloom", "name" -> "sk_bl", "p" -> "16", "k" -> "3",
        "op" -> "show", "probe" -> "5, not-a-number ,9")
    }
    assert(!badProbe.isInstanceOf[NumberFormatException])
    assert(badProbe.getMessage.contains("comma-separated integers"),
      badProbe.getMessage)
    assert(badProbe.getMessage.contains("'not-a-number'"), badProbe.getMessage)

    // reservoir: shard updates merge into a deterministic bottom-k union
    sketch("kind" -> "reservoir", "name" -> "sk_ra", "size" -> "64",
      "op" -> "update", "table" -> "shard_a", "column" -> "uid")
    sketch("kind" -> "reservoir", "name" -> "sk_rb", "size" -> "64",
      "op" -> "update", "table" -> "shard_b", "column" -> "uid")
    val r = sketch("kind" -> "reservoir", "name" -> "sk_ru", "size" -> "64",
      "op" -> "merge", "others" -> "sk_ra,sk_rb")
    assert(r.contains("size=64"), r)
    cache.dropAll()
  }
}
