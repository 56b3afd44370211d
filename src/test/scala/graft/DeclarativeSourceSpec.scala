package graft

import java.nio.file.{Files, Paths}

import graft.cache.SparkCache
import graft.protocol.WriteStrategy
import graft.sources.DeclarativeSource

/** Declarative (YAML manifest) source: $ref resolution, interpolation,
  * spec/discover/check, fixture-backed read through the standard cache
  * path — the reference's `source_manifest=` surface
  * (`airbyte/_executors/declarative.py`, `airbyte/sources/util.py:107`)
  * without network egress. */
class DeclarativeSourceSpec extends SparkTestBase {

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  /** A realistic CDK-shaped manifest: definitions + $ref, an https
    * url_base (mapped to recorded fixtures), config interpolation,
    * inline schemas, primary keys, a partition-routed stream. */
  private def manifest: String =
    """version: "0.29.0"
      |type: DeclarativeSource
      |definitions:
      |  requester:
      |    type: HttpRequester
      |    url_base: "https://api.example.com/v1"
      |  users_stream:
      |    type: DeclarativeStream
      |    name: users
      |    primary_key: ["id"]
      |    schema_loader:
      |      type: InlineSchemaLoader
      |      schema:
      |        type: object
      |        properties:
      |          id: {type: integer}
      |          name: {type: string}
      |          plan: {type: string}
      |    retriever:
      |      type: SimpleRetriever
      |      requester:
      |        $ref: "#/definitions/requester"
      |        path: "/{{ config['tenant'] }}/users"
      |      record_selector:
      |        type: RecordSelector
      |        extractor:
      |          type: DpathExtractor
      |          field_path: ["data", "results"]
      |check:
      |  type: CheckStream
      |  stream_names: ["users"]
      |spec:
      |  type: Spec
      |  connection_specification:
      |    type: object
      |    required: ["tenant"]
      |    properties:
      |      tenant: {type: string}
      |streams:
      |  - $ref: "#/definitions/users_stream"
      |  - type: DeclarativeStream
      |    name: orders
      |    primary_key: ["order_id"]
      |    schema_loader:
      |      type: InlineSchemaLoader
      |      schema:
      |        type: object
      |        properties:
      |          order_id: {type: integer}
      |          user_id: {type: integer}
      |          amount: {type: number}
      |          region: {type: string}
      |    retriever:
      |      type: SimpleRetriever
      |      requester:
      |        $ref: "#/definitions/requester"
      |        path: "/{{ config['tenant'] }}/orders/{{ stream_slice['region'] }}"
      |      record_selector:
      |        type: RecordSelector
      |        extractor:
      |          type: DpathExtractor
      |          field_path: ["orders"]
      |      partition_router:
      |        type: ListPartitionRouter
      |        cursor_field: region
      |        values: ["emea", "apac"]
      |""".stripMargin

  private def stageFixtures(root: String): Unit = {
    write(s"$root/api.example.com/v1/acme/users.json",
      """{"data":{"results":[
        |  {"id":1,"name":"ann","plan":"pro"},
        |  {"id":2,"name":"bo","plan":"free"},
        |  {"id":3,"name":"cy","plan":"pro"}]}}""".stripMargin)
    write(s"$root/api.example.com/v1/acme/orders/emea.json",
      """{"orders":[{"order_id":10,"user_id":1,"amount":9.5,"region":"emea"},
        |           {"order_id":11,"user_id":2,"amount":3.25,"region":"emea"}]}""".stripMargin)
    write(s"$root/api.example.com/v1/acme/orders/apac.json",
      """{"orders":[{"order_id":12,"user_id":3,"amount":7.0,"region":"apac"}]}""".stripMargin)
  }

  private def newSource(root: String): DeclarativeSource = {
    stageFixtures(root)
    new DeclarativeSource("source-example", manifest,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
  }

  test("spec, discover, and check run from the manifest alone") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    assert(src.version.contains("0.29.0"))
    assert(src.specJson.get.contains("\"tenant\""))
    // discover → the shared ConfiguredCatalog model (S2 path reuse)
    assert(src.catalog.streamNames == Seq("users", "orders"))
    assert(src.catalog.primaryKeys("users") == Seq("id"))
    assert(src.catalog("orders").schema.fieldNames.toSeq ==
      Seq("order_id", "user_id", "amount", "region"))
    src.check() // passes: fixtures exist and parse
    val broken = new DeclarativeSource("broken", manifest,
      config = Map("tenant" -> "nosuch"), fixtureRoot = Some(root))
    val e = intercept[java.io.FileNotFoundException](broken.check())
    assert(e.getMessage.contains("nosuch"))
  }

  test("read lands fixture records in the cache via the standard path") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    val cache = SparkCache.fresh(spark, "graft_test_decl")
    val result = src.read(cache, spark)
    assert(result.counts == Map("users" -> 3L, "orders" -> 3L))
    val users = cache.table("users")
    // declared schema projected + metadata columns added
    assert(users.columns.contains("_airbyte_raw_id") &&
      users.columns.contains("_airbyte_extracted_at"))
    assert(users.select("id", "name", "plan").collect().map(_.toSeq).toSet ==
      Set(Seq(1L, "ann", "pro"), Seq(2L, "bo", "free"), Seq(3L, "cy", "pro")))
    // partition-routed stream: records from BOTH slices arrive
    val regions = cache.table("orders").select("region")
      .collect().map(_.getString(0)).toSet
    assert(regions == Set("emea", "apac"))
    // PK declared → AUTO resolves to merge: a second read stays 3 rows
    val again = src.read(cache, spark, writeStrategy = WriteStrategy.Auto)
    assert(again.counts("users") == 3L)
  }

  test("slices parallelize one-per-partition (executor-side extraction)") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    assert(src.sliceUrls("orders").size == 2)
    assert(src.recordJsonl(spark, "orders").rdd.getNumPartitions == 2)
  }

  test("unsupported manifest features fail loudly, not silently") {
    val root = Files.createTempDirectory("graft-decl").toString
    stageFixtures(root)
    val withTransform = manifest.replace(
      "      partition_router:",
      "    transformations:\n      - type: AddFields\n    retriever2:\n      partition_router:")
    // splice keeps YAML valid only for the orders stream edit; assert the error
    val src = new DeclarativeSource("t", withTransform,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    intercept[UnsupportedOperationException](src.sliceUrls("orders"))
    // http(s) without a fixture root is an explicit no-egress error
    // (raised executor-side, so Spark may wrap it — check the chain)
    val noRoot = new DeclarativeSource("n", manifest,
      config = Map("tenant" -> "acme"), fixtureRoot = None)
    val e = intercept[Exception](noRoot.recordJsonl(spark, "users").collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("egress"), msgs)
  }

  test("incremental sync: cursor filters replayed records, state checkpoints") {
    val root = Files.createTempDirectory("graft-decl").toString
    val incManifest =
      """version: "0.29.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: tickets
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          id: {type: integer}
        |          updated_at: {type: string}
        |    incremental_sync:
        |      type: DatetimeBasedCursor
        |      cursor_field: updated_at
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com/v1"
        |        path: "/tickets"
        |      record_selector:
        |        type: RecordSelector
        |        extractor:
        |          type: DpathExtractor
        |          field_path: ["tickets"]
        |""".stripMargin
    def stage(rows: String): Unit =
      write(s"$root/api.example.com/v1/tickets.json", s"""{"tickets":[$rows]}""")
    stage("""{"id":1,"updated_at":"2024-01-01"},{"id":2,"updated_at":"2024-01-05"}""")
    val src = new DeclarativeSource("source-tickets", incManifest,
      fixtureRoot = Some(root))
    assert(src.catalog("tickets").cursorField.contains("updated_at"))
    val cache = SparkCache.fresh(spark, "graft_test_decl_inc")
    src.syncIncremental(cache, spark)
    assert(cache.table("tickets").count() == 2)
    assert(cache.latestState("source-tickets", "tickets").get.contains("2024-01-05"))
    // the API now returns an OVERLAPPING window: old rows replay + one new
    stage("""{"id":1,"updated_at":"2024-01-01"},{"id":2,"updated_at":"2024-01-05"},
            |{"id":3,"updated_at":"2024-02-01"}""".stripMargin)
    src.syncIncremental(cache, spark)
    // replayed ids 1-2 filtered by the cursor; only id 3 appended
    assert(cache.table("tickets").count() == 3)
    assert(cache.table("tickets").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(cache.latestState("source-tickets", "tickets").get.contains("2024-02-01"))
    // a third run with no new data is a no-op
    src.syncIncremental(cache, spark)
    assert(cache.table("tickets").count() == 3)
    cache.dropAll()
  }

  test("Sources.getSource dispatches manifests like the reference get_source") {
    val root = Files.createTempDirectory("graft-decl").toString
    stageFixtures(root)
    val src = graft.sources.Sources.getSource("source-example",
      sourceManifest = Some(manifest),
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    assert(src.isInstanceOf[DeclarativeSource])
    assert(src.catalog.streamNames == Seq("users", "orders"))
    // no install path without egress → explicit error, not a hang
    intercept[UnsupportedOperationException](
      graft.sources.Sources.getSource("source-faker"))
    intercept[IllegalArgumentException](
      graft.sources.Sources.getSource("x",
        localExecutable = Some(Seq("cat")), sourceManifest = Some(manifest)))
  }

  test("interpolation and ref resolution reject unknown keys/pointers") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    intercept[NoSuchElementException](
      new DeclarativeSource("x", manifest, config = Map.empty,
        fixtureRoot = Some(root)).sliceUrls("users"))
    intercept[IllegalArgumentException](
      DeclarativeSource.resolveRefs(DeclarativeSource.parseYaml(
        "a:\n  $ref: \"#/nope\"")))
    val _ = src
  }
}
