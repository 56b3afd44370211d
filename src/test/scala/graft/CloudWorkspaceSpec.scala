package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.cloud._
import graft.protocol._
import graft.sources.{JsonlSource, Source}

/** Workspace lifecycle (reference `cloud/workspaces.py`, `connections.py`,
  * `sync_results.py`): deploy → connect → sync → typed result access,
  * plus failure propagation and referential-delete guards. */
class CloudWorkspaceSpec extends SparkTestBase {

  import spark.implicits._

  private val usersSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private val catalog = ConfiguredCatalog(Seq(
    ConfiguredStream("users", usersSchema, primaryKeys = Seq("id"))))

  private def usersSource(n: Int): Source = new JsonlSource("ws-src", catalog,
    s => {
      import s.implicits._
      s.createDataset((1 to n).map(i =>
        s"""{"type":"RECORD","record":{"stream":"users","data":{"id":$i,"name":"u$i"},"emitted_at":1700000000000}}"""))
    })

  private def failingSource: Source = new Source {
    val name = "boom-src"
    val catalog: ConfiguredCatalog = CloudWorkspaceSpec.this.catalog
    def recordJsonl(s: SparkSession, stream: String) =
      throw new IllegalStateException("connector exploded")
  }

  private def freshWorkspace(tag: String): CloudWorkspace =
    new CloudWorkspace(s"ws-$tag", new LocalWorkspaceApi(spark))

  test("deploy source + destination + connection, run sync, read dataset") {
    val ws = freshWorkspace("ok")
    val srcId = ws.deploySource("users-src", usersSource(7))
    val dstId = ws.deployDestination("dst",
      SparkCache.fresh(spark, "graft_cloud_ok"))
    val conn = ws.deployConnection(srcId, dstId)

    assert(ws.listSources() == Seq(srcId))
    assert(ws.listDestinations() == Seq(dstId))
    assert(conn.streamNames == Seq("users"))

    val result = conn.runSync()
    assert(result.getJobStatus == JobStatus.Succeeded)
    assert(result.isJobComplete)
    assert(result.recordsSynced == 7L)
    assert(result.bytesSynced > 0L)
    assert(result.getAttempts.map(_.status) == Seq(JobStatus.Succeeded))
    assert(result.getFullLogText.contains("users"))

    val ds = result.getDataset("users")
    assert(ds.count() == 7L)
    assert(ds.toDF.select("id").as[Long].collect().sorted.toSeq == (1L to 7L))

    // getSyncResult with no jobId returns the latest job
    val latest = conn.getSyncResult()
    assert(latest.exists(_.jobId == result.jobId))
  }

  test("failed sync surfaces as ConnectionSyncError with the connector log") {
    val ws = freshWorkspace("fail")
    val srcId = ws.deploySource("boom", failingSource)
    val dstId = ws.deployDestination("dst",
      SparkCache.fresh(spark, "graft_cloud_fail"))
    val conn = ws.deployConnection(srcId, dstId)

    val err = intercept[ConnectionSyncError] { conn.runSync() }
    assert(err.connectionId == conn.connectionId)
    assert(err.getMessage.contains("connector exploded"))

    // non-waiting path exposes the failed status without raising
    val result = conn.getSyncResult().get
    assert(result.getJobStatus == JobStatus.Failed)
    assert(result.recordsSynced == 0L)
  }

  test("stream state is per-connection and validated against configured streams") {
    val ws = freshWorkspace("state")
    val srcId = ws.deploySource("s", usersSource(1))
    val dstId = ws.deployDestination("d",
      SparkCache.fresh(spark, "graft_cloud_state"))
    val conn = ws.deployConnection(srcId, dstId)

    assert(conn.streamState("users").isEmpty)
    conn.setStreamState("users", """{"cursor": 42}""")
    // blobs ride the whole-connection artifact and come back in
    // canonical JSON form (whitespace normalized, values intact)
    assert(conn.streamState("users").contains("""{"cursor":42}"""))
    intercept[IllegalArgumentException] { conn.streamState("nope") }
    intercept[IllegalArgumentException] { conn.setStreamState("nope", "{}") }
  }

  test("deletes are guarded while a connection references the resource") {
    val ws = freshWorkspace("del")
    val srcId = ws.deploySource("s", usersSource(1))
    val dstId = ws.deployDestination("d",
      SparkCache.fresh(spark, "graft_cloud_del"))
    val conn = ws.deployConnection(srcId, dstId)

    intercept[IllegalArgumentException] { ws.permanentlyDeleteSource(srcId) }
    intercept[IllegalArgumentException] { ws.permanentlyDeleteDestination(dstId) }
    ws.permanentlyDeleteConnection(conn)
    ws.permanentlyDeleteSource(srcId)
    ws.permanentlyDeleteDestination(dstId)
    assert(ws.listSources().isEmpty && ws.listDestinations().isEmpty)
  }

  test("merge-upsert across two syncs of the same connection is idempotent") {
    val ws = freshWorkspace("merge")
    val srcId = ws.deploySource("s", usersSource(5))
    val dstId = ws.deployDestination("d",
      SparkCache.fresh(spark, "graft_cloud_merge"))
    val conn = ws.deployConnection(srcId, dstId)

    val first = conn.runSync()
    val second = conn.runSync()
    assert(first.jobId != second.jobId)
    // AUTO resolves to merge on the PK'd stream: same 5 ids both times
    assert(second.getDataset("users").count() == 5L)
    assert(conn.getSyncResult().exists(_.jobId == second.jobId))
  }

  // ---- connection mutation surface (connections.py:739-915) ---------

  private val twoStreamCatalog = ConfiguredCatalog(Seq(
    ConfiguredStream("users", usersSchema, primaryKeys = Seq("id")),
    ConfiguredStream("events", usersSchema)))

  private def twoStreamSource: Source = new JsonlSource("two-src", twoStreamCatalog,
    s => {
      import s.implicits._
      s.createDataset(Seq(
        """{"type":"RECORD","record":{"stream":"users","data":{"id":1,"name":"a"},"emitted_at":1700000000000}}""",
        """{"type":"RECORD","record":{"stream":"events","data":{"id":9,"name":"e"},"emitted_at":1700000000000}}"""))
    })

  test("connection mutations: rename, table prefix, selected streams, enable/disable, schedule") {
    val ws = freshWorkspace("mut")
    val srcId = ws.deploySource("s", twoStreamSource)
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_cloud_mut"))
    val conn = ws.deployConnection(srcId, dstId)
    assert(conn.streamNames.toSet == Set("users", "events"))

    conn.rename("renamed-conn")
    assert(conn.name == "renamed-conn")
    conn.setTablePrefix("pre_")
    assert(conn.tablePrefix == "pre_")

    // stream selection validates against the source catalog
    conn.setSelectedStreams(Seq("users"))
    assert(conn.streamNames == Seq("users"))
    val bad = intercept[IllegalArgumentException](
      conn.setSelectedStreams(Seq("users", "nope")))
    assert(bad.getMessage.contains("nope"))

    // enable/disable: noop transitions silent by default, raise on demand
    assert(conn.enabled)
    conn.setEnabled(true) // silent noop
    intercept[IllegalArgumentException](conn.setEnabled(true, ignoreNoop = false))
    conn.setEnabled(false)
    assert(!conn.enabled)
    // a disabled connection refuses to sync
    val refusal = intercept[IllegalArgumentException](conn.runSync())
    assert(refusal.getMessage.contains("disabled"))
    conn.setEnabled(true)
    assert(conn.runSync().getJobStatus == JobStatus.Succeeded)

    // scheduling: cron then back to manual (cron cleared)
    conn.setSchedule("0 */6 * * *")
    assert(conn.info.scheduleType == "cron" &&
      conn.info.cronExpression.contains("0 */6 * * *"))
    conn.setManualSchedule()
    assert(conn.info.scheduleType == "manual" && conn.info.cronExpression.isEmpty)

    // the MCP update tool drives the same path with its validations
    import graft.mcp.CloudTools
    intercept[IllegalArgumentException](
      CloudTools.updateCloudConnection(ws, conn.connectionId))
    intercept[IllegalArgumentException](
      CloudTools.updateCloudConnection(ws, conn.connectionId,
        cronExpression = Some("0 0 * * *"), manualSchedule = Some(true)))
    val summary = CloudTools.updateCloudConnection(ws, conn.connectionId,
      enabled = Some(false), cronExpression = Some("0 0 * * *"))
    assert(summary.contains("disabled") && summary.contains("0 0 * * *"))
    assert(!conn.enabled && conn.info.cronExpression.contains("0 0 * * *"))
  }

  test("state artifacts: dump/import in both formats, portable blobs, stream-level patch-through") {
    val ws = freshWorkspace("stateart")
    val srcId = ws.deploySource("s", usersSource(2))
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_cloud_sa"))
    val conn = ws.deployConnection(srcId, dstId)

    // no state yet: protocol dump is empty, raw reports not_set
    assert(conn.dumpRawState() == "[]")
    assert(conn.dumpRawState(normalize = false).contains("\"not_set\""))

    // stream-level set patches through the whole-connection doc
    conn.setStreamState("users", """{"cursor":"2024-01-01"}""")
    val protocol = conn.dumpRawState()
    assert(protocol.contains("\"type\":\"STREAM\""))
    assert(protocol.contains("\"stream_descriptor\""))
    assert(protocol.contains("\"cursor\":\"2024-01-01\""))
    assert(conn.streamState("users").contains("""{"cursor":"2024-01-01"}"""))

    // raw dump → import into ANOTHER connection: connectionId overridden
    val conn2 = ws.deployConnection(srcId, dstId)
    conn2.importRawState(conn.dumpRawState(normalize = false))
    assert(conn2.streamState("users").contains("""{"cursor":"2024-01-01"}"""))
    assert(conn2.dumpRawState(normalize = false)
      .contains(s""""connectionId":"${conn2.connectionId}""""))

    // protocol-array import round-trips too
    val conn3 = ws.deployConnection(srcId, dstId)
    conn3.importRawState(protocol)
    assert(conn3.streamState("users").contains("""{"cursor":"2024-01-01"}"""))

    // GLOBAL state: denormalize → raw, stream entries still reachable
    val globalMsg =
      """[{"type":"GLOBAL","global":{"shared_state":{"cdc":"lsn-7"},
        |"stream_states":[{"stream_descriptor":{"name":"users"},"stream_state":{"cursor":"g1"}}]}}]"""
        .stripMargin.replaceAll("\n", "")
    conn3.importRawState(globalMsg)
    assert(conn3.dumpRawState(normalize = false).contains("\"stateType\":\"global\""))
    assert(conn3.streamState("users").contains("""{"cursor":"g1"}"""))
    // and normalizing back yields the GLOBAL protocol message
    assert(conn3.dumpRawState().contains("\"shared_state\":{\"cdc\":\"lsn-7\"}"))

    // updating a stream inside a global state patches streamStates
    conn3.setStreamState("users", """{"cursor":"g2"}""")
    assert(conn3.streamState("users").contains("""{"cursor":"g2"}"""))
    assert(conn3.dumpRawState(normalize = false).contains("\"stateType\":\"global\""))
  }

  test("catalog artifacts: protocol and raw dumps, import replaces the stream selection") {
    val ws = freshWorkspace("catart")
    val srcId = ws.deploySource("s", twoStreamSource)
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_cloud_ca"))
    val conn = ws.deployConnection(srcId, dstId)

    val protocol = conn.dumpRawCatalog()
    assert(protocol.contains("\"sync_mode\"") && protocol.contains("\"json_schema\""))
    assert(protocol.contains("\"users\"") && protocol.contains("\"events\""))
    val raw = conn.dumpRawCatalog(normalize = false)
    assert(raw.contains("\"syncMode\"") && raw.contains("\"config\""))
    assert(conn.getCatalogArtifact == protocol)

    // import a raw catalog with events deselected → selection shrinks
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.readTree(raw)
    doc.path("streams").forEach { s =>
      if (s.path("stream").path("name").asText() == "events")
        s.path("config").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("selected", false)
    }
    conn.importRawCatalog(doc.toString)
    assert(conn.streamNames == Seq("users"))

    // protocol-format import (all entries implicitly selected) restores both
    conn.importRawCatalog(protocol)
    assert(conn.streamNames.toSet == Set("users", "events"))
    assert(conn.checkIsValid())
  }

  test("connector handles: name, check, rename, update_config") {
    val ws = freshWorkspace("connector")
    val srcId = ws.deploySource("users-source", usersSource(1))
    val dstId = ws.deployDestination("dest", SparkCache.fresh(spark, "graft_cloud_cn"))

    val src = ws.getSource(srcId)
    assert(src.name == "users-source" && src.connectorType == "source")
    assert(src.check().success)
    src.rename("renamed-source")
    assert(src.name == "renamed-source")
    src.updateConfig("""{"api_key":"k1"}""")
    assert(src.configJson.contains("""{"api_key":"k1"}"""))
    intercept[Exception](src.updateConfig("{not json"))

    val dst = ws.getDestination(dstId)
    assert(dst.check().success)
    dst.rename("renamed-dest")
    assert(dst.name == "renamed-dest")

    // generic sources check catalog presence only — a source whose
    // catalog resolves passes even if reads would fail (the reference's
    // check is likewise a connection test, not a full read)
    val badId = ws.deploySource("bad", failingSource)
    assert(ws.getSource(badId).check().success)
    // a source with an empty catalog fails check with a message
    val emptyId = ws.deploySource("empty", new Source {
      val name = "empty-src"
      val catalog: ConfiguredCatalog = ConfiguredCatalog(Seq.empty)
      def recordJsonl(s: SparkSession, stream: String) =
        { import s.implicits._; s.emptyDataset[String] }
    })
    val failed = ws.getSource(emptyId).check()
    assert(!failed.success && failed.toString.startsWith("Failed:"))
    // a failed check is a CONNECTOR error (IllegalStateException base,
    // the ConnectorCheckFailedError convention) with named context
    val checkErr = intercept[IllegalStateException](
      ws.getSource(emptyId).check(raiseOnError = true))
    assert(checkErr.isInstanceOf[graft.errors.GraftError])
    assert(checkErr.asInstanceOf[graft.errors.GraftError]
      .context("connector_type") == "source")
    intercept[NoSuchElementException](ws.getSource("src-999"))

    // MCP describe tools surface the refreshed names
    import graft.mcp.CloudTools
    assert(CloudTools.describeCloudSource(ws, srcId).name == "renamed-source")
    assert(CloudTools.describeCloudDestination(ws, dstId).name == "renamed-dest")
    assert(CloudTools.renameCloudSource(ws, srcId, "final").name == "final")
  }

  test("custom source definitions: publish, validate, deploy, update, draft, guarded delete") {
    val ws = freshWorkspace("defs")
    val root = java.nio.file.Files.createTempDirectory("graft-defs").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/api.x.com"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/api.x.com/items.json"),
      """{"items":[{"id":1,"v":"a"},{"id":2,"v":"b"}]}""".getBytes("UTF-8"))
    def manifest(version: String): String =
      s"""version: "$version"
         |type: DeclarativeSource
         |streams:
         |  - type: DeclarativeStream
         |    name: items
         |    primary_key: ["id"]
         |    schema_loader:
         |      type: InlineSchemaLoader
         |      schema:
         |        type: object
         |        properties:
         |          id: {type: integer}
         |          v: {type: string}
         |    retriever:
         |      type: SimpleRetriever
         |      requester:
         |        type: HttpRequester
         |        url_base: "https://api.x.com"
         |        path: "/items"
         |      record_selector:
         |        type: RecordSelector
         |        extractor:
         |          type: DpathExtractor
         |          field_path: ["items"]
         |""".stripMargin

    // validation mirrors the reference messages
    assert(intercept[IllegalArgumentException](
      ws.publishCustomSourceDefinition("x", "- just\n- a list\n"))
      .getMessage.startsWith("Manifest must be a dictionary"))
    assert(intercept[IllegalArgumentException](
      ws.publishCustomSourceDefinition("x", "foo: bar\n"))
      .getMessage.contains("missing required fields: version, type"))
    assert(intercept[IllegalArgumentException](
      ws.publishCustomSourceDefinition("x", "version: \"1\"\ntype: Other\n"))
      .getMessage.contains("must be 'DeclarativeSource', got 'Other'"))

    val defn = ws.publishCustomSourceDefinition("my-items delete-me", manifest("0.1.0"))
    assert(defn.name == "my-items delete-me" && defn.version.contains("0.1.0"))
    assert(ws.listCustomSourceDefinitions().map(_.definitionId) == Seq(defn.definitionId))
    // uniqueness guard
    intercept[IllegalArgumentException](
      ws.publishCustomSourceDefinition("my-items delete-me", manifest("0.1.0")))

    // deploy a source from the definition and sync it end-to-end
    val srcId = defn.deploySource("items-src", fixtureRoot = Some(root))
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_cloud_defs"))
    val conn = ws.deployConnection(srcId, dstId)
    val res = conn.runSync()
    assert(res.recordsSynced == 2L)
    assert(res.getDataset("items").count() == 2L)

    // update bumps the manifest + version; drafts live alongside
    defn.updateDefinition(manifest("0.2.0"))
    assert(defn.version.contains("0.2.0"))
    assert(!defn.hasDraft)
    defn.setDraftManifest(manifest("0.3.0-draft"))
    assert(defn.hasDraft)
    assert(ws.getCustomSourceDefinition(defn.definitionId)
      .draftManifest.exists(_.contains("0.3.0-draft")))

    // safe-mode delete: allowed here because the name contains delete-me
    defn.permanentlyDelete()
    assert(ws.listCustomSourceDefinitions().isEmpty)
    // and refused when the name lacks the marker
    val keeper = ws.publishCustomSourceDefinition("production-items", manifest("1.0"))
    val guard = intercept[IllegalArgumentException](keeper.permanentlyDelete())
    assert(guard.getMessage.contains("delete-me"))
    keeper.permanentlyDelete(safeMode = false)

    // MCP tool facade over the same lifecycle
    import graft.mcp.CloudTools
    val pub = CloudTools.publishCustomSourceDefinition(
      ws, "mcp-def delete-me", manifest("2.0"))
    assert(CloudTools.listCustomSourceDefinitions(ws).map(_.name) == Seq("mcp-def delete-me"))
    assert(CloudTools.getConnectorBuilderDraftManifest(ws, pub.definitionId).isEmpty)
    assert(CloudTools.updateCustomSourceDefinition(ws, pub.definitionId,
      manifest("2.1")).version.contains("2.1"))
    CloudTools.permanentlyDeleteCustomSourceDefinition(ws, pub.definitionId)
    assert(CloudTools.listCustomSourceDefinitions(ws).isEmpty)

    // definitions are server-side workspace state: a second workspace
    // handle over the SAME api sees publications made through the first
    val ws2 = new CloudWorkspace(ws.workspaceId, ws.api)
    val shared = ws.publishCustomSourceDefinition("shared-def delete-me", manifest("3.0"))
    assert(ws2.listCustomSourceDefinitions().map(_.name).contains("shared-def delete-me"))
    ws2.getCustomSourceDefinition(shared.definitionId)
      .setDraftManifest(manifest("3.1"))
    assert(ws.getCustomSourceDefinition(shared.definitionId).hasDraft)
    shared.permanentlyDelete(safeMode = false)
    assert(ws2.listCustomSourceDefinitions().isEmpty)
  }

  test("cache<->destination equivalence: config round-trip, deploy-by-config, getSqlCache") {
    val ws = freshWorkspace("bridge")
    val cache = SparkCache.fresh(spark, "graft_cloud_bridge")

    // config derived from a cache round-trips to an equivalent cache
    val config = CacheDestinationBridge.destinationConfigFor(cache)
    assert(config.contains("\"destinationType\":\"spark\""))
    val reopened = CacheDestinationBridge.destinationToCache(spark, config)
    assert(reopened.database == cache.database &&
      reopened.tablePrefix == cache.tablePrefix)
    // schemaName override re-points the target (reference :96-101)
    assert(CacheDestinationBridge.destinationToCache(spark, config,
      schemaName = Some("graft_cloud_bridge_alt")).database == "graft_cloud_bridge_alt")
    // unsupported type / missing type are loud, listing what IS supported
    val bad = intercept[IllegalArgumentException](
      CacheDestinationBridge.destinationToCache(spark,
        """{"destinationType":"postgres","database":"x"}"""))
    assert(bad.getMessage.contains("not supported") && bad.getMessage.contains("spark"))
    intercept[IllegalArgumentException](
      CacheDestinationBridge.destinationToCache(spark, """{"database":"x"}"""))

    // deploy a destination FROM the config document, sync, read back
    val srcId = ws.deploySource("s", usersSource(4))
    val dstId = ws.deployDestinationConfig("warehouse", config)
    val conn = ws.deployConnection(srcId, dstId)
    val result = conn.runSync()
    assert(result.recordsSynced == 4L)
    // getSqlCache opens the destination's CONFIG as a cache: same data
    val derived = result.getSqlCache
    assert(derived.database == cache.database)
    assert(derived.table("users").count() == 4L)
    assert(result.getSqlTableName("users") == cache.tableName("users"))
    // the API serves the equivalence config for engine destinations
    assert(ws.api.destinationConfig(dstId).exists(_.contains("graft_cloud_bridge")))
  }

  test("connection artifact MCP tool returns protocol-format state and catalog") {
    val ws = freshWorkspace("artifact")
    val srcId = ws.deploySource("s", usersSource(1))
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_cloud_art"))
    val conn = ws.deployConnection(srcId, dstId)

    import graft.mcp.CloudTools
    assert(CloudTools.getConnectionArtifact(ws, conn.connectionId, "state")
      .contains("No state is set"))
    conn.setStreamState("users", """{"cursor":"c1"}""")
    assert(CloudTools.getConnectionArtifact(ws, conn.connectionId, "state")
      .contains("\"type\":\"STREAM\""))
    assert(CloudTools.getConnectionArtifact(ws, conn.connectionId, "catalog")
      .contains("\"sync_mode\""))
    intercept[IllegalArgumentException](
      CloudTools.getConnectionArtifact(ws, conn.connectionId, "nope"))
  }
}
