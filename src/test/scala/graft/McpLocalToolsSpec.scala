package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.cache.SparkCache
import graft.mcp.LocalTools
import graft.sources.DeclarativeSource

/** The MCP local tool surface (reference mcp/local.py) as typed
  * delegations onto existing engine surfaces, exercised end-to-end
  * against a declarative source + cache. */
class McpLocalToolsSpec extends SparkTestBase {

  /** Enable the trusted-execution gate for `body` (restored in finally
    * per the repo rule — a failed assertion must not leak the stub). */
  private def withTrusted[T](body: => T): T = {
    import graft.mcp.TrustedExecution
    val prev = TrustedExecution.envReader
    TrustedExecution.envReader =
      name => if (name == TrustedExecution.EnvVar) Some("1") else None
    try body finally TrustedExecution.envReader = prev
  }

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
    withTrusted {
      assert(LocalTools.listConnectorConfigSecrets(spec) == Seq("api_key"))
    }
  }

  test("dotenv secrets list names only, never values") {
    val root = Files.createTempDirectory("graft-mcp").toString
    write(s"$root/.env", "API_KEY=supersecret\n# comment\nDB_URL=\"jdbc:x\"\n")
    val out = withTrusted {
      LocalTools.listDotenvSecrets(Seq(s"$root/.env", s"$root/missing.env"))
    }
    assert(out(s"$root/.env") == Seq("API_KEY", "DB_URL"))
    assert(out(s"$root/missing.env").isEmpty)
    assert(!out.toString.contains("supersecret"))
  }

  test("cache tools: sync, list, describe, guarded sql, destination smoke") {
    val root = Files.createTempDirectory("graft-mcp").toString
    val src = newSource(root)
    val cache = SparkCache.fresh(spark, "graft_test_mcp")
    withTrusted {
    val result = LocalTools.syncSourceToCache(cache, spark, src)
    assert(result.counts("users") == 2L)
    val listed = LocalTools.listCachedStreams(cache)
    assert(listed.map(_.streamName) == Seq("users"))
    // a failed sync pre-registers streams before any write — those
    // phantoms (registered, no backing table) must not be listed
    cache.preRegisterStreams(Seq("ghost_stream"))
    assert(LocalTools.listCachedStreams(cache).map(_.streamName) == Seq("users"))
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
    }
    cache.dropAll()
  }

  test("trusted-execution gate: every trusted-machine tool hard-fails when off") {
    import graft.mcp.TrustedExecution
    val root = Files.createTempDirectory("graft-mcp").toString
    val src = newSource(root)
    val spec = src.specJson.get
    val cache = SparkCache.fresh(spark, "graft_test_mcp_gate")
    val prev = TrustedExecution.envReader
    TrustedExecution.envReader = _ => None // explicit OFF, real env ignored
    try {
      def denied[T](body: => T): String =
        intercept[TrustedExecution.TrustedExecutionRequiredException](body).feature
      assert(denied(LocalTools.listConnectorConfigSecrets(spec))
        .contains("list_connector_config_secrets"))
      assert(denied(LocalTools.listDotenvSecrets(Seq(s"$root/.env")))
        .contains("list_dotenv_secrets"))
      assert(denied(LocalTools.syncSourceToCache(cache, spark, src))
        .contains("sync_source_to_cache"))
      assert(denied(LocalTools.listCachedStreams(cache))
        .contains("list_cached_streams"))
      assert(denied(LocalTools.describeDefaultCache(cache))
        .contains("describe_default_cache"))
      assert(denied(LocalTools.runSqlQuery(cache, "SELECT 1"))
        .contains("run_sql_query"))
      assert(denied(LocalTools.destinationSmokeTest(cache, "users", Seq("true")))
        .contains("destination_smoke_test"))
      assert(denied(LocalTools.runDestinationSmokeTest(spark))
        .contains("destination_smoke_test"))
      assert(denied(LocalTools.smokeTestToProcess(spark, Seq("true")))
        .contains("destination_smoke_test"))
      // ungated, reference-parity: pure spec rendering stays available
      assert(LocalTools.listSourceStreams(src) == Seq("users"))
      assert(LocalTools.validateConnectorConfig(spec,
        """{"tenant":"acme","api_key":"k"}""").isEmpty)
    } finally {
      TrustedExecution.envReader = prev
      cache.dropAll()
    }
  }

  test("cloud tool set: deploy -> connect -> sync -> status/logs -> list/describe -> delete") {
    import org.apache.spark.sql.types._
    import graft.cloud.{CloudWorkspace, LocalWorkspaceApi}
    import graft.mcp.CloudTools
    import graft.protocol.{ConfiguredCatalog, ConfiguredStream}
    import graft.sources.JsonlSource

    val catalog = ConfiguredCatalog(Seq(ConfiguredStream("users",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))),
      primaryKeys = Seq("id"))))
    val source = new JsonlSource("mcp-src", catalog, s => {
      import s.implicits._
      s.createDataset((1 to 3).map(i =>
        s"""{"type":"RECORD","record":{"stream":"users","data":{"id":$i,"name":"u$i"},"emitted_at":1700000000000}}"""))
    })
    val ws = new CloudWorkspace("ws-mcp", new LocalWorkspaceApi(spark))

    val src = CloudTools.deploySourceToCloud(ws, "crm", source)
    assert(src.url == s"local://workspaces/ws-mcp/sources/${src.id}")
    val dst = CloudTools.deployDestinationToCloud(ws, "warehouse",
      SparkCache.fresh(spark, "graft_test_mcpcloud"))
    val conn = CloudTools.createConnectionOnCloud(ws, "crm-to-warehouse", src.id, dst.id)
    assert(conn.sourceId == src.id && conn.destinationId == dst.id)

    assert(CloudTools.checkAirbyteCloudWorkspace(ws)
      .contains("1 source(s), 1 destination(s), 1 connection(s)"))

    val sync = CloudTools.runCloudSync(ws, conn.id)
    assert(sync.status == "succeeded" && sync.recordsSynced == 3L)
    val status = CloudTools.getCloudSyncStatus(ws, conn.id).get
    assert(status.jobId == sync.jobId && status.status == "succeeded")
    assert(CloudTools.listCloudSyncJobs(ws, conn.id).map(_.jobId) == Seq(sync.jobId))
    assert(CloudTools.getCloudSyncLogs(ws, conn.id).contains("[succeeded]"))

    assert(CloudTools.listDeployedCloudSourceConnectors(ws)
      .map(r => (r.id, r.name)) == Seq((src.id, "crm")))
    assert(CloudTools.listDeployedCloudDestinationConnectors(ws)
      .map(r => (r.id, r.name)) == Seq((dst.id, "warehouse")))
    val listed = CloudTools.listDeployedCloudConnections(ws, withConnectionStatus = true)
    assert(listed.map(_.id) == Seq(conn.id))
    assert(listed.head.lastJobStatus.contains("succeeded") &&
      listed.head.lastJobId.contains(sync.jobId))
    val desc = CloudTools.describeCloudConnection(ws, conn.id)
    assert(desc("source_id") == src.id && desc("streams") == "users")

    // referential-delete guard, then full teardown
    intercept[IllegalArgumentException](
      CloudTools.permanentlyDeleteCloudSource(ws, src.id))
    CloudTools.permanentlyDeleteCloudConnection(ws, conn.id)
    CloudTools.permanentlyDeleteCloudSource(ws, src.id)
    CloudTools.permanentlyDeleteCloudDestination(ws, dst.id)
    assert(CloudTools.checkAirbyteCloudWorkspace(ws)
      .contains("0 source(s), 0 destination(s), 0 connection(s)"))
  }

  test("organization-scoped client: workspace listing, org lookup, billing lock rollup") {
    import graft.cloud.{LocalCloudClient, OrganizationInfo}
    import graft.mcp.CloudTools
    val client = new LocalCloudClient(spark)
    client.registerOrganization(OrganizationInfo("org-1", "Acme",
      email = Some("ops@acme.example"),
      paymentStatus = Some("ok"), subscriptionStatus = Some("subscribed")))
    client.registerOrganization(OrganizationInfo("org-2", "Globex",
      paymentStatus = Some("disabled"), subscriptionStatus = Some("unsubscribed")))
    client.registerWorkspace("ws-a", "analytics", "org-1")
    client.registerWorkspace("ws-b", "billing", "org-1")
    client.registerWorkspace("ws-c", "other", "org-2")

    // org-scoped only — id or exact name; filters + limit server-side
    assert(CloudTools.listCloudWorkspaces(client, organizationId = Some("org-1"))
      .map(_.id) == Seq("ws-a", "ws-b"))
    assert(CloudTools.listCloudWorkspaces(client, organizationName = Some("Acme"),
      nameContains = Some("bill")).map(_.id) == Seq("ws-b"))
    assert(CloudTools.listCloudWorkspaces(client, organizationId = Some("org-1"),
      limit = Some(1)).map(_.id) == Seq("ws-a"))
    intercept[IllegalArgumentException](CloudTools.listCloudWorkspaces(client))
    intercept[NoSuchElementException](
      CloudTools.listCloudWorkspaces(client, organizationName = Some("Nope")))

    // id <-> name lookup + billing rollup (disabled/unsubscribed locks)
    val acme = CloudTools.describeCloudOrganization(client, organizationName = Some("Acme"))
    assert(acme.id == "org-1" && acme.email.contains("ops@acme.example") && !acme.isAccountLocked)
    val globex = CloudTools.describeCloudOrganization(client, organizationId = Some("org-2"))
    assert(globex.isAccountLocked, "disabled payment + unsubscribed must lock")

    // workspace handles from the client are full engine-backed workspaces
    assert(CloudTools.checkAirbyteCloudWorkspace(client.getWorkspace("ws-a"))
      .contains("0 source(s)"))
  }

  test("name matching is locale-independent (dotted-I under a Turkish JVM locale)") {
    import graft.cloud.{LocalCloudClient, OrganizationInfo}
    val client = new LocalCloudClient(spark)
    client.registerOrganization(OrganizationInfo("org-tr", "INVOICES Inc"))
    client.registerWorkspace("ws-i", "BILLING", "org-tr")
    val prior = java.util.Locale.getDefault
    try {
      // Turkish locale: default-locale toLowerCase maps 'I' -> 'ı'
      // (dotless), so "INVOICES".toLowerCase would NOT contain "invoices"
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(client.listOrganizations(Some("invoices")).map(_.organizationId)
        == Seq("org-tr"))
      assert(client.listWorkspaces("org-tr", Some("billing")).map(_.workspaceId)
        == Seq("ws-i"))
    } finally java.util.Locale.setDefault(prior)
  }

  test("destination smoke test tools: scenario suite to cache and to a subprocess") {
    // cache destination: one named scenario, preflight skipped for speed
    graft.cache.SparkCache.fresh(spark, "zz_mcp_smoke")
    val result = withTrusted { LocalTools.runDestinationSmokeTest(spark,
      scenarios = "basic_types,single_record_stream",
      reuseNamespace = Some("zz_mcp_smoke"), skipPreflight = true) }
    assert(result.success && result.preflightPassed.isEmpty)
    assert(result.recordsDelivered == 4L) // 3 + 1
    assert(result.tableStatistics.keySet == Set("basic_types", "single_record_stream"))
    assert(result.tableStatistics("basic_types").rowCount == 3L)

    // subprocess destination: the FULL protocol stream (traces included)
    // lands on the command's stdin
    val sink = java.nio.file.Files.createTempFile("graft-smoke", ".jsonl")
    val n = withTrusted { LocalTools.smokeTestToProcess(spark,
      Seq("sh", "-c", s"cat > $sink"), scenarios = "basic_types") }
    assert(n == 3L)
    val lines = java.nio.file.Files.readAllLines(sink)
    assert(lines.size == 6, "2 opening traces + 3 records + COMPLETE")
    assert(lines.get(0).contains("\"STARTED\"") && lines.get(5).contains("\"COMPLETE\""))
    assert(lines.asScala.count(_.startsWith("""{"type":"RECORD"""")) == 3)
  }

  test("smoke-to-process: chatty destination (stdout > pipe buffer) doesn't deadlock") {
    // `large_string_values` pushes ~100KB lines; a destination that echoes its
    // whole stdin back (3x) overflows the ~64KB OS pipe buffer. Without
    // the background drain the child blocks on write, stops reading, and
    // the pump hangs forever.
    val n = withTrusted { LocalTools.smokeTestToProcess(spark,
      Seq("sh", "-c", "while IFS= read -r l; do printf '%s\\n%s\\n%s\\n' \"$l\" \"$l\" \"$l\"; done"),
      scenarios = "large_string_values") }
    assert(n > 0L)
  }
}
