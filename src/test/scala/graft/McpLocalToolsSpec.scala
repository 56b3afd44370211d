package graft

import java.nio.file.{Files, Paths}

import graft.cache.SparkCache
import graft.mcp.LocalTools
import graft.sources.DeclarativeSource

/** The MCP local tool surface (reference mcp/local.py) as typed
  * delegations onto existing engine surfaces, exercised end-to-end
  * against a declarative source + cache. */
class McpLocalToolsSpec extends SparkTestBase {

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  private val manifest =
    """version: "0.29.0"
      |type: DeclarativeSource
      |spec:
      |  type: Spec
      |  connection_specification:
      |    type: object
      |    required: ["tenant", "api_key"]
      |    properties:
      |      tenant: {type: string}
      |      api_key: {type: string, airbyte_secret: true}
      |      page_size: {type: integer}
      |streams:
      |  - type: DeclarativeStream
      |    name: users
      |    primary_key: ["id"]
      |    schema_loader:
      |      type: InlineSchemaLoader
      |      schema:
      |        type: object
      |        properties:
      |          id: {type: integer}
      |          name: {type: string}
      |          score: {type: number}
      |          joined: {type: string, format: date}
      |    retriever:
      |      type: SimpleRetriever
      |      requester:
      |        type: HttpRequester
      |        url_base: "https://api.example.com/v1"
      |        path: "/{{ config['tenant'] }}/users"
      |      record_selector:
      |        type: RecordSelector
      |        extractor:
      |          type: DpathExtractor
      |          field_path: ["results"]
      |""".stripMargin

  private def newSource(root: String): DeclarativeSource = {
    write(s"$root/api.example.com/v1/acme/users.json",
      """{"results":[{"id":1,"name":"ann","score":1.5,"joined":"2024-01-02"},
        |            {"id":2,"name":"bo","score":2.5,"joined":"2024-02-03"}]}""".stripMargin)
    new DeclarativeSource("source-example", manifest,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
  }

  test("stream introspection: list, json schema, records, previews") {
    val root = Files.createTempDirectory("graft-mcp").toString
    val src = newSource(root)
    assert(LocalTools.listSourceStreams(src) == Seq("users"))
    val schema = LocalTools.getSourceStreamJsonSchema(src, "users")
    assert(schema.contains("\"id\":{\"type\":\"integer\"}"))
    assert(schema.contains("\"score\":{\"type\":\"number\"}"))
    assert(schema.contains("\"format\":\"date\""))
    val recs = LocalTools.readSourceStreamRecords(spark, src, "users", limit = 1)
    assert(recs.size == 1 && recs.head.contains("\"id\""))
    val previews = LocalTools.getStreamPreviews(spark, src)
    assert(previews("users").toOption.get.size == 2)
    // on_error=ignore: an unknown stream reports, doesn't throw
    val bad = LocalTools.getStreamPreviews(spark, src, streams = Seq("nope"))
    assert(bad("nope").isLeft)
  }

  test("config validation and secret listing from the spec") {
    val root = Files.createTempDirectory("graft-mcp").toString
    val src = newSource(root)
    val spec = src.specJson.get
    assert(LocalTools.validateConnectorConfig(spec,
      """{"tenant":"acme","api_key":"k"}""").isEmpty)
    val missing = LocalTools.validateConnectorConfig(spec, """{"tenant":"acme"}""")
    assert(missing.exists(_.contains("api_key")))
    val badType = LocalTools.validateConnectorConfig(spec,
      """{"tenant":"acme","api_key":"k","page_size":"ten"}""")
    assert(badType.exists(_.contains("page_size")))
    assert(LocalTools.listConnectorConfigSecrets(spec) == Seq("api_key"))
  }

  test("dotenv secrets list names only, never values") {
    val root = Files.createTempDirectory("graft-mcp").toString
    write(s"$root/.env", "API_KEY=supersecret\n# comment\nDB_URL=\"jdbc:x\"\n")
    val out = LocalTools.listDotenvSecrets(Seq(s"$root/.env", s"$root/missing.env"))
    assert(out(s"$root/.env") == Seq("API_KEY", "DB_URL"))
    assert(out(s"$root/missing.env").isEmpty)
    assert(!out.toString.contains("supersecret"))
  }

  test("cache tools: sync, list, describe, guarded sql, destination smoke") {
    val root = Files.createTempDirectory("graft-mcp").toString
    val src = newSource(root)
    val cache = SparkCache.fresh(spark, "graft_test_mcp")
    val result = LocalTools.syncSourceToCache(cache, spark, src)
    assert(result.counts("users") == 2L)
    val listed = LocalTools.listCachedStreams(cache)
    assert(listed.map(_.streamName) == Seq("users"))
    val desc = LocalTools.describeDefaultCache(cache)
    assert(desc("database") == "graft_test_mcp" && desc("stream_count") == "1")
    // guarded SQL: reads pass, writes rejected
    val rows = LocalTools.runSqlQuery(cache,
      s"SELECT count(*) AS n FROM ${cache.tableName("users")}").collect()
    assert(rows.head.getLong(0) == 2L)
    intercept[IllegalArgumentException](
      LocalTools.runSqlQuery(cache, s"DROP TABLE ${cache.tableName("users")}"))
    // destination smoke: replay the stream into a process stdin
    val delivered = LocalTools.destinationSmokeTest(
      cache, "users", Seq("sh", "-c", "cat > /dev/null"))
    assert(delivered == 2L)
    cache.dropAll()
  }
}
