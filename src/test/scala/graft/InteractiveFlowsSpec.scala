package graft

import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.cloud.{CloudWorkspace, LocalWorkspaceApi}
import graft.mcp.InteractiveFlows
import graft.mcp.InteractiveFlows._
import graft.protocol.{ConfiguredCatalog, ConfiguredStream}
import graft.sources.{JsonlSource, Registry, Source}

/**
 * Interactive MCP elicitation flows as typed state machines (reference
 * `mcp/interactive/_registry_ui.py`, `_sync_history_ui.py`,
 * `_workspace_sync_status_ui.py`): spec-driven transcripts asserting
 * each flow's filter rules, preview caps, metric derivations, agent
 * text, and UI-event state transitions.
 */
class InteractiveFlowsSpec extends SparkTestBase {

  // -- registry catalog fixture (8 connectors, mixed levels/types) ----
  private def entry(repo: String, level: String): String =
    s"""{"dockerRepository": "airbyte/$repo", "dockerImageTag": "1.0.0",
       | "supportLevel": "$level",
       | "documentationUrl": "https://docs.example/$repo"}""".stripMargin
  private val registry = Registry.fromJson(
    s"""{"sources": [
       |  ${entry("source-faker", "certified")},
       |  ${entry("source-pokeapi", "community")},
       |  ${entry("source-legacy", "archived")},
       |  ${entry("source-github", "certified")}
       |],
       |"destinations": [
       |  ${entry("destination-duckdb", "certified")},
       |  ${entry("destination-dev-null", "community")}
       |]}""".stripMargin)

  test("catalog flow: filters, mutual exclusions, precedence thresholds, search") {
    // no filters → everything, name-sorted
    val all = showConnectorsList(registry)
    assert(all.connectorCount == 6)
    assert(all.connectors.map(_.connectorName) == Seq(
      "destination-dev-null", "destination-duckdb", "source-faker",
      "source-github", "source-legacy", "source-pokeapi"))
    assert(all.filters.summary == "No filters applied")

    // certified shorthand == support_level exact match
    val certified = showConnectorsList(registry, certified = true)
    assert(certified.connectors.map(_.connectorName) == Seq(
      "destination-duckdb", "source-faker", "source-github"))
    // mutual exclusion rules (registry_ui.py:151-163)
    intercept[IllegalArgumentException](
      showConnectorsList(registry, certified = true, supportLevel = "community"))
    intercept[IllegalArgumentException](showConnectorsList(registry,
      supportLevel = "certified", minSupportLevel = "community"))
    intercept[IllegalArgumentException](showConnectorsList(registry, limit = -1))

    // min threshold uses precedence; legacy integer form parses too
    assert(showConnectorsList(registry, minSupportLevel = "community")
      .connectorCount == 5) // everything but archived
    assert(showConnectorsList(registry, minSupportLevel = "200").connectorCount == 5)
    intercept[IllegalArgumentException](SupportLevel.parse("gold"))

    // type filter + search + limit compose
    val sources = showConnectorsList(registry, connectorType = "source")
    assert(sources.connectors.forall(_.connectorType == "source"))
    intercept[IllegalArgumentException](parseConnectorType("pipeline"))
    assert(showConnectorsList(registry, search = "DUCK")
      .connectors.map(_.connectorName) == Seq("destination-duckdb"))
    val limited = showConnectorsList(registry, limit = 2)
    assert(limited.connectorCount == 2 && limited.filters.limit.contains(2))
    assert(limited.filters.summary == "Limit: 2")
  }

  test("catalog flow: model preview cap vs full user render, selection state machine") {
    // a registry bigger than the 25-row model cap
    val big = Registry.fromJson(
      (1 to 30).map(i => entry(f"source-x$i%02d", "community"))
        .mkString("""{"sources": [""", ",", "]}"))
    val result = showConnectorsList(big)
    assert(result.connectorCount == 30)
    assert(result.connectors.size == 30) // the user-facing widget renders all
    assert(result.modelPreview.size == CatalogAgentPreviewLimit)
    assert(result.modelPreviewTruncated && result.modelPreviewOmittedCount == 5)
    assert(result.renderNote.contains("capped to 25") &&
      result.renderNote.contains("all 30"))

    // elicitation: click a row → details + actions; stale clicks ignored
    val s = result.session
    assert(s.selected.isEmpty && s.openDocsUrl.isEmpty)
    s(RowClick("source-x07"))
    assert(s.selected.exists(_.connectorName == "source-x07"))
    assert(s.openDocsUrl.contains("https://docs.example/source-x07"))
    assert(s.askAboutMessage.contains(
      "Summarize Airbyte connector source-x07 from the selected connector list."))
    s(RowClick("source-nonexistent")) // stale/foreign click: no-op
    assert(s.selected.exists(_.connectorName == "source-x07"))
    s(ClearSelection)
    assert(s.selected.isEmpty)
  }

  test("support labels and display values match the reference mapping") {
    assert(supportLabel("certified") == "Airbyte")
    assert(supportLabel("community") == "Marketplace")
    assert(supportLabel("enterprise") == "Enterprise")
    assert(supportLabel("release_candidate") == "Release Candidate")
    assert(displayValue("") == "")
    assert(formatBytes(2500000000L) == "2.5 GB")
    assert(formatBytes(1500000L) == "1.5 MB")
    assert(formatBytes(1200L) == "1.2 KB")
    assert(formatBytes(999L) == "999 B")
    assert(formatRecords(2500000L) == "2.5M")
    assert(formatRecords(1500L) == "1.5K")
    assert(formatRecords(999L) == "999")
  }

  // -- engine-backed workspace fixture --------------------------------
  private val usersSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val catalog = ConfiguredCatalog(Seq(
    ConfiguredStream("users", usersSchema, primaryKeys = Seq("id"))))
  private def source(n: Int): Source = new JsonlSource("flow-src", catalog, s => {
    import s.implicits._
    s.createDataset((1 to n).map(i =>
      s"""{"type":"RECORD","record":{"stream":"users","data":{"id":$i,"name":"u$i"},"emitted_at":1700000000000}}"""))
  })
  private def failingSource: Source = new Source {
    val name = "boom"
    val catalog: ConfiguredCatalog = InteractiveFlowsSpec.this.catalog
    def recordJsonl(s: org.apache.spark.sql.SparkSession, stream: String) =
      throw new IllegalStateException("kaboom")
  }

  test("sync history flow: rollups, chart rows, agent-context levels") {
    val ws = new CloudWorkspace("ws-hist", new LocalWorkspaceApi(spark))
    val srcId = ws.deploySource("s", source(3))
    val dstId = ws.deployDestination("d", SparkCache.fresh(spark, "graft_flow_hist"))
    val conn = ws.deployConnection(srcId, dstId)
    conn.runSync(); conn.runSync()
    // one failed sync in the history
    val badSrc = ws.deploySource("bad", failingSource)
    ws.api.updateSourceConfig(srcId, "{}") // no-op touch; keeps srcId live
    val conn2 = ws.deployConnection(badSrc,
      ws.deployDestination("d2", SparkCache.fresh(spark, "graft_flow_hist2")))
    intercept[graft.cloud.ConnectionSyncError](conn2.runSync())

    val hist = showConnectionSyncHistory(ws, conn.connectionId, agentContext = "min")
    assert(hist.totalJobs == 2 && hist.succeeded == 2)
    assert(hist.successRate == 100.0)
    assert(hist.totalRecords == 6L)
    assert(hist.jobs.head.jobId > hist.jobs.last.jobId) // newest first
    assert(hist.chartRows.size == 2 &&
      hist.chartRows.forall(r => r.succeeded == 1 && r.failed == 0))
    assert(hist.chartRows.head.records == 3L)
    assert(hist.jobs.forall(_.startTimeMs > 0L)) // real start stamps
    assert(hist.agentText.contains("already been shown") &&
      hist.agentText.contains("2 jobs, 100.0% success rate"))

    // summary and verbose levels add bounded detail
    val summary = showConnectionSyncHistory(ws, conn.connectionId,
      agentContext = "summary", suppressUi = true)
    assert(!summary.uiRendered)
    assert(summary.agentText.contains("2 total sync jobs") &&
      summary.agentText.contains("6 records synced"))
    val verbose = showConnectionSyncHistory(ws, conn.connectionId, agentContext = "verbose")
    assert(verbose.agentText.contains("\"status\":\"succeeded\"") &&
      verbose.agentText.contains("Agent-only context"))

    // the failed connection's history reports the failure
    val failed = showConnectionSyncHistory(ws, conn2.connectionId)
    assert(failed.totalJobs == 1 && failed.succeeded == 0 && failed.successRate == 0.0)

    // window validation
    intercept[IllegalArgumentException](
      showConnectionSyncHistory(ws, conn.connectionId, maxJobs = 0))
    intercept[IllegalArgumentException](
      showConnectionSyncHistory(ws, conn.connectionId, maxJobs = 101))
    intercept[IllegalArgumentException](
      showConnectionSyncHistory(ws, conn.connectionId, agentContext = "chatty"))
  }

  test("workspace sync status flow: per-connection rollups, metrics, pie, filter machine") {
    val ws = new CloudWorkspace("ws-status", new LocalWorkspaceApi(spark))
    val ok = ws.deployConnection(
      ws.deploySource("ok", source(2)),
      ws.deployDestination("okd", SparkCache.fresh(spark, "graft_flow_ok")))
    ok.runSync(); ok.runSync()
    val bad = ws.deployConnection(
      ws.deploySource("bad", failingSource),
      ws.deployDestination("badd", SparkCache.fresh(spark, "graft_flow_bad")))
    ws.api.patchConnection(bad.connectionId, name = Some("bad"))
    intercept[graft.cloud.ConnectionSyncError](bad.runSync())
    val idle = ws.deployConnection(
      ws.deploySource("idle", source(1)),
      ws.deployDestination("idled", SparkCache.fresh(spark, "graft_flow_idle")))

    val result = showWorkspaceSyncStatus(ws, agentContext = "summary")
    assert(result.metrics.totalConnections == 3)
    assert(result.metrics.problemConnections == 1)
    assert(result.metrics.recentCompletedJobs == 3) // 2 ok + 1 failed
    assert(result.metrics.recentSuccessRate == 66.7)
    assert(result.metrics.recentlySyncedConnections == 2) // idle never synced
    assert(result.metrics.recentRecordsSynced == 4L)

    val byId = result.connections.map(s => s.connectionId -> s).toMap
    val okStatus = byId(ok.connectionId)
    assert(okStatus.latestStatus == "succeeded" && okStatus.recentJobs == 2 &&
      okStatus.successRate == 100.0 && !okStatus.isProblem)
    val badStatus = byId(bad.connectionId)
    assert(badStatus.latestStatus == "failed" && badStatus.isProblem &&
      badStatus.recentFailures == 1)
    val idleStatus = byId(idle.connectionId)
    assert(idleStatus.latestStatus == "no syncs" &&
      idleStatus.latestSyncTimeMs.isEmpty && !idleStatus.isProblem)
    assert(okStatus.suggestedToolCall.contains(ok.connectionId))

    // pie: fixed category order, zero categories dropped
    assert(result.statusPie == Seq(
      "Succeeded" -> 1, "No syncs" -> 1, "Failed" -> 1))
    assert(statusPieCategory("error") == "Failed" &&
      statusPieCategory("canceled") == "Canceled" &&
      statusPieCategory("running") == "Other")

    // agent text names problem connections at summary level
    assert(result.agentText.contains("1 problem connections") &&
      result.agentText.contains("Problem connection names: bad"))
    val verbose = showWorkspaceSyncStatus(ws, agentContext = "verbose")
    assert(verbose.agentText.contains("Agent-only capped connection preview"))

    // status-filter elicitation machine
    val s = result.session
    assert(s.statusFilter == "All" && s.visibleRows.size == 3)
    s(SetStatusFilter("Failed"))
    assert(s.visibleRows.map(_.connectionId) == Seq(bad.connectionId))
    s(SetStatusFilter("No syncs"))
    assert(s.visibleRows.map(_.connectionId) == Seq(idle.connectionId))
    intercept[IllegalArgumentException](s.setStatusFilter("Broken"))
    // ...but a stale/foreign UI EVENT with an unknown category is a
    // no-op (like a RowClick on a vanished CatalogSession row): the
    // panel keeps its current filter instead of crashing
    s(SetStatusFilter("Broken"))
    assert(s.statusFilter == "No syncs" &&
      s.visibleRows.map(_.connectionId) == Seq(idle.connectionId))
    s(SetStatusFilter("All"))
    assert(s.visibleRows.size == 3)

    // recently-synced window: with a 1-hour-ago clock everything ages out
    val shifted = showWorkspaceSyncStatus(ws, recentHours = 1,
      nowMs = System.currentTimeMillis() + 2L * 3600 * 1000)
    assert(shifted.metrics.recentlySyncedConnections == 0)

    // parameter validation
    intercept[IllegalArgumentException](showWorkspaceSyncStatus(ws, maxConnections = 0))
    intercept[IllegalArgumentException](
      showWorkspaceSyncStatus(ws, maxJobsPerConnection = 11))
    intercept[IllegalArgumentException](showWorkspaceSyncStatus(ws, recentHours = 721))
  }

  test("test-my-tools prompt: guidance with optional scope appendix") {
    val plain = InteractiveFlows.testMyToolsPrompt()
    assert(plain.size == 1 && plain.head._1 == "user")
    assert(plain.head._2.startsWith("You are testing the MCP tools"))
    assert(!plain.head._2.contains("Additional scope"))
    val scoped = InteractiveFlows.testMyToolsPrompt(Some("only cache tools"))
    assert(scoped.head._2.contains("Additional scope or constraints:\nonly cache tools"))
    assert(InteractiveFlows.testMyToolsPrompt(Some("")) == plain)
  }
}
