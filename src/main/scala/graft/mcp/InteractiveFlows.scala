package graft.mcp

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.collection.immutable.ListMap

import graft.cloud.{CloudWorkspace, JobInfo, JobStatus}
import graft.errors.GraftInputError
import graft.sources.Registry.ConnectorMetadata

/**
 * Interactive MCP elicitation flows, transport-free (reference
 * `airbyte/mcp/interactive/_registry_ui.py:1-550`,
 * `_sync_history_ui.py:1-412`, `_workspace_sync_status_ui.py:1-764`,
 * `_shared_models.py:1-127`).
 *
 * The reference renders these as Prefab UI component trees over
 * FastMCP; the rendering toolkit is transport, but everything the
 * flows DECIDE is object model: filter parsing and mutual-exclusion
 * rules, preview caps that bound what reaches the model vs what the
 * user sees, three-level agent-context text, dashboard metric
 * derivations, status categorization, and the client-side state
 * machines (row selection, status filtering) driven by UI events.
 * This module implements exactly that layer as typed values: each
 * `show*` returns a result holding the bounded `agentText`, the full
 * rows "rendered to the user", and a [[Session]] whose `apply(event)`
 * transitions mirror the reference's `SetState` handlers.
 */
object InteractiveFlows {

  // ------------------------------------------------------------------
  // Shared models (_shared_models.py)
  // ------------------------------------------------------------------

  /** Support levels ordered by precedence (_shared_models.py:11-44):
    * archived(100) < community(200) < certified(300). `parse` accepts
    * the keyword or the legacy integer precedence. */
  object SupportLevel {
    val Precedence: Map[String, Int] =
      Map("archived" -> 100, "community" -> 200, "certified" -> 300)

    def parse(value: String): String =
      if (Precedence.contains(value)) value
      else Precedence.find { case (_, p) => value == p.toString }
        .map(_._1)
        .getOrElse(throw new GraftInputError(
          s"Unrecognized support level: '$value'.",
          guidance = Some(s"Expected keyword " +
            s"(${Precedence.keys.toList.sorted.mkString(", ")}) or integer " +
            s"(${Precedence.values.toList.sorted.mkString(", ")})."),
          context = ListMap("support_level" -> value)))

    def precedence(level: String): Int = Precedence.getOrElse(level, 0)
  }

  /** `ConnectorType.parse` (_shared_models.py:47-62). */
  def parseConnectorType(value: String): String =
    if (value == "source" || value == "destination") value
    else throw new GraftInputError(
      s"Unrecognized connector type: '$value'.",
      guidance = Some("Expected one of: `source`, `destination`."),
      context = ListMap("connector_type" -> value))

  // ------------------------------------------------------------------
  // Connector catalog flow (_registry_ui.py)
  // ------------------------------------------------------------------

  /** Cap on what reaches the MODEL; the user-facing widget renders all
    * rows (_registry_ui.py:53 CONNECTOR_CATALOG_AGENT_PREVIEW_LIMIT). */
  val CatalogAgentPreviewLimit = 25

  final case class CatalogFilters(
      certified: Boolean = false,
      supportLevel: Option[String] = None,
      minSupportLevel: Option[String] = None,
      connectorType: Option[String] = None,
      search: String = "",
      limit: Option[Int] = None) {
    /** `_connector_applied_filters` (:497-504): only non-empty filters. */
    def applied: Seq[(String, String)] = Seq(
      "Certified" -> (if (certified) "true" else ""),
      "Support level" -> supportLevel.getOrElse(""),
      "Minimum support level" -> minSupportLevel.getOrElse(""),
      "Type" -> connectorType.getOrElse(""),
      "Search" -> search,
      "Limit" -> limit.map(_.toString).getOrElse("")
    ).filter(_._2.nonEmpty)
    /** `_connector_applied_filter_summary` (:507-512). */
    def summary: String =
      if (applied.isEmpty) "No filters applied"
      else applied.map { case (l, v) => s"$l: $v" }.mkString(", ")
  }

  final case class ConnectorSummary(
      connectorName: String,
      displayName: String,
      connectorType: String,
      definitionId: Option[String],
      dockerRepository: String,
      dockerImageTag: Option[String],
      supportLevel: Option[String],
      documentationUrl: Option[String])

  final case class CatalogResult(
      connectorCount: Int,
      filters: CatalogFilters,
      /** ALL matching rows — what the interactive widget renders. */
      connectors: Seq[ConnectorSummary],
      /** The capped slice that reaches the model's context. */
      modelPreview: Seq[ConnectorSummary],
      modelPreviewTruncated: Boolean,
      modelPreviewOmittedCount: Int,
      renderNote: String,
      session: CatalogSession)

  /** `_connector_support_label` (:515-523): marketing labels. */
  def supportLabel(value: String): String = value.toLowerCase(java.util.Locale.ROOT) match {
    case "certified" => "Airbyte"
    case "community" => "Marketplace"
    case "enterprise" => "Enterprise"
    case other => displayValue(other)
  }

  /** `_connector_display_value` (:526-529): snake_case → Title Case. */
  def displayValue(value: String): String =
    if (value.isEmpty) ""
    else value.split('_').filter(_.nonEmpty)
      .map(w => w.head.toUpper.toString + w.tail).mkString(" ")

  /** One elicitation state machine: the catalog's `selected_connector`
    * slot, driven by the table's row-click `SetState` (:318-320). */
  final class CatalogSession(rows: Seq[ConnectorSummary]) extends Session {
    private var selectedName: Option[String] = None

    def selected: Option[ConnectorSummary] =
      selectedName.flatMap(n => rows.find(_.connectorName == n))

    /** Row click → selection; unknown rows are ignored (a stale click
      * after a filter change must not corrupt the panel). */
    def selectRow(connectorName: String): this.type = {
      if (rows.exists(_.connectorName == connectorName))
        selectedName = Some(connectorName)
      this
    }
    def clearSelection(): this.type = { selectedName = None; this }

    /** The detail panel's actions (:354-370): docs link + the agent
      * message the "Ask about connector" button sends. */
    def openDocsUrl: Option[String] = selected.flatMap(_.documentationUrl)
    def askAboutMessage: Option[String] = selected.map(c =>
      s"Summarize Airbyte connector ${c.connectorName} from the selected connector list.")

    def apply(event: UiEvent): this.type = event match {
      case RowClick(id) => selectRow(id)
      case ClearSelection => clearSelection()
      case _ => this
    }
  }

  /**
   * `show_connectors_list` (_registry_ui.py:80-215): filter validation
   * with the reference's mutual-exclusion rules, deterministic
   * name-sorted listing, and the model-vs-user preview split.
   */
  def showConnectorsList(
      registry: Seq[ConnectorMetadata],
      supportLevel: String = "",
      certified: Boolean = false,
      minSupportLevel: String = "",
      connectorType: String = "",
      search: String = "",
      limit: Int = 0): CatalogResult = {
    if (limit < 0)
      throw new GraftInputError("Limit parameter must be non-negative.",
        context = ListMap("limit" -> limit))
    var eff: Option[String] = if (certified) Some("certified") else None
    if (supportLevel.nonEmpty) {
      if (certified) throw new GraftInputError(
        "Cannot specify both `certified` and `support_level`.",
        guidance = Some("Use `certified=True` as shorthand or " +
          "`support_level` for explicit control."))
      eff = Some(SupportLevel.parse(supportLevel))
    }
    val effMin =
      if (minSupportLevel.nonEmpty) Some(SupportLevel.parse(minSupportLevel)) else None
    if (eff.isDefined && effMin.isDefined)
      throw new GraftInputError(
        "Cannot specify both `certified` or `support_level` and " +
          "`min_support_level`.",
        guidance = Some("Use an exact match or a threshold."))
    val effType =
      if (connectorType.nonEmpty) Some(parseConnectorType(connectorType)) else None

    val filters = CatalogFilters(certified, eff, effMin, effType, search,
      if (limit > 0) Some(limit) else None)

    def typeOf(m: ConnectorMetadata): String =
      if (m.canonicalName.startsWith("source-")) "source"
      else if (m.canonicalName.startsWith("destination-")) "destination"
      else throw new GraftInputError(
        s"Cannot determine connector type from connector name: '${m.name}'.",
        guidance = Some("Connector names start with `source-` or `destination-`."),
        context = ListMap("connector_name" -> m.name))

    val searchLower = search.toLowerCase(java.util.Locale.ROOT)
    def searchable(m: ConnectorMetadata): Seq[String] =
      Seq(m.canonicalName, m.dockerRepository) ++
        m.documentationUrl.toSeq ++ m.supportLevel.toSeq

    val matching = registry
      .filter(m => effType.forall(_ == typeOf(m)))
      .filter(m => eff.forall(l => m.supportLevel.contains(l)))
      .filter(m => effMin.forall(min => m.supportLevel.exists(l =>
        SupportLevel.precedence(l) >= SupportLevel.precedence(min))))
      .filter(m => searchLower.isEmpty || searchable(m).exists(
        _.toLowerCase(java.util.Locale.ROOT).contains(searchLower)))
      .sortBy(_.canonicalName)

    val limited = filters.limit.fold(matching)(matching.take)
    val rows = limited.map(m => ConnectorSummary(
      connectorName = m.canonicalName,
      displayName = m.canonicalName,
      connectorType = typeOf(m),
      definitionId = None,
      dockerRepository = m.dockerRepository,
      dockerImageTag = Some(m.dockerImageTag),
      supportLevel = m.supportLevel,
      documentationUrl = m.documentationUrl))

    val preview = rows.take(CatalogAgentPreviewLimit)
    CatalogResult(
      connectorCount = rows.size,
      filters = filters,
      connectors = rows,
      modelPreview = preview,
      modelPreviewTruncated = rows.size > preview.size,
      modelPreviewOmittedCount = rows.size - preview.size,
      renderNote =
        s"The `connectors` array is capped to $CatalogAgentPreviewLimit entries " +
          s"for model context. The interactive widget renders all ${rows.size} " +
          "matching connectors.",
      session = new CatalogSession(rows))
  }

  // ------------------------------------------------------------------
  // UI event vocabulary (the typed analog of Prefab's SetState actions)
  // ------------------------------------------------------------------

  sealed trait UiEvent
  final case class RowClick(id: String) extends UiEvent
  case object ClearSelection extends UiEvent
  final case class SetStatusFilter(status: String) extends UiEvent

  trait Session { def apply(event: UiEvent): this.type }

  // ------------------------------------------------------------------
  // Humanized formatting (_sync_history_ui.py:48-74)
  // ------------------------------------------------------------------

  def formatBytes(n: Long): String =
    if (n >= 1000000000L) f"${n / 1e9}%.1f GB"
    else if (n >= 1000000L) f"${n / 1e6}%.1f MB"
    else if (n >= 1000L) f"${n / 1e3}%.1f KB"
    else s"$n B"

  def formatRecords(n: Long): String =
    if (n >= 1000000L) f"${n / 1e6}%.1fM"
    else if (n >= 1000L) f"${n / 1e3}%.1fK"
    else n.toString

  private val timeFmt = DateTimeFormatter.ofPattern("HH:mm").withZone(ZoneOffset.UTC)
  private val dateTimeFmt =
    DateTimeFormatter.ofPattern("MM/dd HH:mm").withZone(ZoneOffset.UTC)

  /** `_time_label` (:69-74): date included only on multi-day history. */
  def timeLabel(epochMs: Long, includeDate: Boolean): String =
    (if (includeDate) dateTimeFmt else timeFmt).format(Instant.ofEpochMilli(epochMs))

  // ------------------------------------------------------------------
  // Connection sync-history flow (_sync_history_ui.py)
  // ------------------------------------------------------------------

  final case class HistoryJobRow(
      jobId: Long, status: String, recordsSynced: Long, bytesSynced: Long,
      startTimeMs: Long)

  final case class HistoryChartRow(
      time: String, succeeded: Int, failed: Int, records: Long, bytes: Long)

  final case class SyncHistoryResult(
      connectionId: String,
      connectionName: String,
      totalJobs: Int,
      succeeded: Int,
      successRate: Double,
      totalRecords: Long,
      totalBytes: Long,
      /** newest-first, as the table shows */
      jobs: Seq[HistoryJobRow],
      /** oldest-first, as the timeline charts plot */
      chartRows: Seq[HistoryChartRow],
      /** bounded text for the agent — NOT a reprint of the dashboard */
      agentText: String,
      uiRendered: Boolean)

  /**
   * `show_connection_sync_history` (:88-222): job-window validation,
   * success-rate/record/byte rollups, chronological chart rows with
   * date-aware labels, and the three agent-context levels whose text
   * explicitly tells the agent the user has already seen the dashboard.
   */
  def showConnectionSyncHistory(
      ws: CloudWorkspace,
      connectionId: String,
      maxJobs: Int = 30,
      agentContext: String = "min",
      suppressUi: Boolean = false): SyncHistoryResult = {
    if (maxJobs < 1 || maxJobs > 100)
      throw new GraftInputError(
        s"max_jobs must be within [1, 100], got $maxJobs",
        context = ListMap("max_jobs" -> maxJobs))
    if (!Set("verbose", "summary", "min")(agentContext))
      throw new GraftInputError(
        s"agent_context must be one of verbose|summary|min, got '$agentContext'",
        context = ListMap("agent_context" -> agentContext))
    val conn = ws.api.getConnection(connectionId)
    val name = if (conn.name.nonEmpty) conn.name else connectionId
    // from_tail=True: the LAST maxJobs jobs, newest first (:148-151)
    val jobs: Seq[JobInfo] =
      ws.api.listJobs(connectionId).takeRight(maxJobs).reverse.map(ws.api.jobInfo)

    val rows = jobs.map(j => HistoryJobRow(
      j.jobId, j.status.name, j.recordsSynced, j.bytesSynced, j.startTimeMs))
    val totalJobs = rows.size
    val succeeded = rows.count(_.status.contains("succeeded"))
    val successRate = if (totalJobs > 0) succeeded.toDouble / totalJobs * 100 else 0.0
    val totalRecords = rows.map(_.recordsSynced).sum
    val totalBytes = rows.map(_.bytesSynced).sum

    val chronological = rows.reverse
    val multiDay = chronological.map(r =>
      Instant.ofEpochMilli(r.startTimeMs).toString.take(10)).distinct.size > 1
    val chartRows = chronological.map { r =>
      val ok = r.status.contains("succeeded")
      HistoryChartRow(timeLabel(r.startTimeMs, multiDay),
        if (ok) 1 else 0, if (ok) 0 else 1, r.recordsSynced, r.bytesSynced)
    }

    val header =
      s"The user has already been shown an interactive sync history dashboard " +
        s"for connection '$name' ($connectionId). Do not re-summarize or " +
        "reprint this data — the user can already see it."
    val rate1 = math.round(successRate * 10) / 10.0
    val agentText = agentContext match {
      case "min" =>
        s"$header\n\nSummary: $totalJobs jobs, $rate1% success rate.\n\n" +
          "To retrieve more detail without re-rendering the UI, call this " +
          "tool again with suppress_ui=True and agent_context='verbose' or " +
          "agent_context='summary'."
      case "summary" =>
        s"$header\n\nWhat the user sees: $totalJobs total sync jobs, " +
          s"$succeeded succeeded, $rate1% success rate, " +
          s"${formatRecords(totalRecords)} records synced, " +
          s"${formatBytes(totalBytes)} bytes synced. Charts show per-job " +
          "success/failure, records over time, and bytes over time. A data " +
          s"table lists all $totalJobs jobs with IDs, statuses, and timestamps.\n\n" +
          "To retrieve more detail without re-rendering the UI, call this " +
          "tool again with suppress_ui=True and agent_context='verbose'."
      case _ =>
        val preview = rows.take(10).map(r =>
          s"""{"job_id":${r.jobId},"status":"${r.status}","records_synced":${r.recordsSynced},"bytes_synced":${r.bytesSynced}}""")
        s"$header\n\nAgent-only context (first ${math.min(totalJobs, 10)} jobs " +
          s"for follow-up analysis):\n[${preview.mkString(",")}]"
    }

    SyncHistoryResult(connectionId, name, totalJobs, succeeded, successRate,
      totalRecords, totalBytes, rows, chartRows, agentText,
      uiRendered = !suppressUi)
  }

  // ------------------------------------------------------------------
  // Workspace sync-status flow (_workspace_sync_status_ui.py)
  // ------------------------------------------------------------------

  val WorkspaceStatusAgentPreviewLimit = 20
  val SuccessHigh = 90.0
  val SuccessLow = 50.0

  /** `WorkspaceConnectionSyncStatus` (:79-121). */
  final case class ConnectionSyncStatus(
      connectionId: String,
      connectionName: String,
      latestStatus: String,
      latestJobId: Option[Long],
      latestSyncTimeMs: Option[Long],
      latestRecordsSynced: Long,
      latestBytesSynced: Long,
      recentJobs: Int,
      recentSuccesses: Int,
      recentFailures: Int,
      recentRecordsSynced: Long,
      recentBytesSynced: Long,
      runningJobId: Option[Long],
      suggestedToolCall: String) {
    def isProblem: Boolean =
      Set("failed", "cancelled", "error", "unknown")(latestStatus)
    def successRate: Double = {
      val completed = recentSuccesses + recentFailures
      if (completed == 0) 0.0 else recentSuccesses.toDouble / completed * 100
    }
  }

  final case class WorkspaceMetricSummary(
      totalConnections: Int,
      recentlySyncedConnections: Int,
      problemConnections: Int,
      runningConnections: Int,
      recentSuccessRate: Double,
      recentCompletedJobs: Int,
      recentRecordsSynced: Long,
      recentBytesSynced: Long)

  final case class WorkspaceSyncStatusResult(
      workspaceId: String,
      connections: Seq[ConnectionSyncStatus],
      metrics: WorkspaceMetricSummary,
      statusPie: Seq[(String, Int)],
      agentText: String,
      modelPreview: Seq[ConnectionSyncStatus],
      modelPreviewTruncated: Boolean,
      uiRendered: Boolean,
      session: DashboardSession)

  /** Status → pie category (:60-76 _STATUS_PIE_STYLE_BY_STATUS). */
  def statusPieCategory(status: String): String = status.toLowerCase(java.util.Locale.ROOT) match {
    case "succeeded" => "Succeeded"
    case "cancelled" | "canceled" => "Canceled"
    case "no syncs" => "No syncs"
    case "failed" | "error" => "Failed"
    case _ => "Other"
  }

  /** The dashboard's status-filter state machine
    * (`_status_filter_controls`, :685-724): one selected category (or
    * "All") narrowing the visible connection rows. */
  final class DashboardSession(rows: Seq[ConnectionSyncStatus]) extends Session {
    private val validCategories =
      Set("All", "Succeeded", "Canceled", "No syncs", "Failed", "Other")
    private var filter: String = "All"
    def statusFilter: String = filter
    def setStatusFilter(category: String): this.type = {
      if (!validCategories(category))
        throw new GraftInputError(
          s"unknown status category '$category' (valid: $validCategories)",
          context = ListMap("category" -> category))
      filter = category; this
    }
    def visibleRows: Seq[ConnectionSyncStatus] =
      if (filter == "All") rows
      else rows.filter(r => statusPieCategory(r.latestStatus) == filter)
    // A stale/foreign UI event must never crash the panel — an unknown
    // category is a no-op, like a RowClick on a vanished CatalogSession
    // row; only the direct setStatusFilter call validates.
    def apply(event: UiEvent): this.type = event match {
      case SetStatusFilter(s) if validCategories(s) => setStatusFilter(s)
      case _ => this
    }
  }

  /**
   * `show_workspace_sync_status` (:126-249 + `_summarize_connection`
   * :251-313 + `_build_workspace_metric_summary` :324-368): per-
   * connection recent-job rollups with the reference's latest-status
   * resolution (a running newest job reports the latest COMPLETED
   * status and exposes `runningJobId` separately), dashboard metrics,
   * and bounded three-level agent text.
   */
  def showWorkspaceSyncStatus(
      ws: CloudWorkspace,
      maxConnections: Int = 50,
      maxJobsPerConnection: Int = 5,
      recentHours: Int = 24,
      agentContext: String = "min",
      suppressUi: Boolean = false,
      nowMs: Long = System.currentTimeMillis()): WorkspaceSyncStatusResult = {
    if (maxConnections < 1 || maxConnections > 100)
      throw new GraftInputError(
        s"max_connections must be within [1, 100], got $maxConnections",
        context = ListMap("max_connections" -> maxConnections))
    if (maxJobsPerConnection < 1 || maxJobsPerConnection > 10)
      throw new GraftInputError(
        s"max_jobs_per_connection must be within [1, 10], got $maxJobsPerConnection",
        context = ListMap("max_jobs_per_connection" -> maxJobsPerConnection))
    if (recentHours < 1 || recentHours > 720)
      throw new GraftInputError(
        s"recent_hours must be within [1, 720], got $recentHours",
        context = ListMap("recent_hours" -> recentHours))
    if (!Set("verbose", "summary", "min")(agentContext))
      throw new GraftInputError(
        s"agent_context must be one of verbose|summary|min, got '$agentContext'",
        context = ListMap("agent_context" -> agentContext))

    val statuses = ws.api.listConnections().take(maxConnections).map { conn =>
      val jobs = ws.api.listJobs(conn.connectionId)
        .takeRight(maxJobsPerConnection).reverse.map(ws.api.jobInfo)
      val completed = jobs.filter(j => JobStatus.finalStatuses.contains(j.status))
      val latest = jobs.headOption
      val latestCompleted = completed.headOption
      // a still-running newest job: display the latest completed status,
      // surface the running id separately (:266-283)
      val display = latest match {
        case Some(j) if JobStatus.finalStatuses.contains(j.status) => Some(j)
        case _ => latestCompleted.orElse(latest)
      }
      val running = latest.filterNot(j => JobStatus.finalStatuses.contains(j.status))
      ConnectionSyncStatus(
        connectionId = conn.connectionId,
        connectionName = if (conn.name.nonEmpty) conn.name else conn.connectionId,
        latestStatus = display.map(_.status.name).getOrElse("no syncs"),
        latestJobId = display.map(_.jobId),
        latestSyncTimeMs = display.map(_.startTimeMs),
        latestRecordsSynced = display.map(_.recordsSynced).getOrElse(0L),
        latestBytesSynced = display.map(_.bytesSynced).getOrElse(0L),
        recentJobs = completed.size,
        recentSuccesses = completed.count(_.status == JobStatus.Succeeded),
        recentFailures = completed.count(j =>
          j.status == JobStatus.Failed || j.status == JobStatus.Cancelled),
        recentRecordsSynced = completed.map(_.recordsSynced).sum,
        recentBytesSynced = completed.map(_.bytesSynced).sum,
        runningJobId = running.map(_.jobId),
        suggestedToolCall =
          s"""show_connection_sync_history(connection_id="${conn.connectionId}")""")
    }

    val recentlySynced = statuses.count(_.latestSyncTimeMs.exists(t =>
      (nowMs - t).toDouble / 3600000.0 <= recentHours))
    val completedJobs = statuses.map(s => s.recentSuccesses + s.recentFailures).sum
    val successes = statuses.map(_.recentSuccesses).sum
    val rate =
      if (completedJobs > 0) successes.toDouble / completedJobs * 100 else 0.0
    val metrics = WorkspaceMetricSummary(
      totalConnections = statuses.size,
      recentlySyncedConnections = recentlySynced,
      problemConnections = statuses.count(_.isProblem),
      runningConnections = statuses.count(_.runningJobId.isDefined),
      recentSuccessRate = math.round(rate * 10) / 10.0,
      recentCompletedJobs = completedJobs,
      recentRecordsSynced = statuses.map(_.recentRecordsSynced).sum,
      recentBytesSynced = statuses.map(_.recentBytesSynced).sum)

    // pie rows keep the reference's fixed category order (:60-66)
    val pie = Seq("Succeeded", "Canceled", "No syncs", "Failed", "Other")
      .map(c => c -> statuses.count(s => statusPieCategory(s.latestStatus) == c))
      .filter(_._2 > 0)

    val header =
      "The user has already been shown an interactive workspace sync status " +
        s"dashboard for workspace '${ws.workspaceId}'. Do not reprint the full table."
    val summary =
      s"Summary: ${metrics.totalConnections} connections, " +
        s"${metrics.recentlySyncedConnections} recently synced, " +
        s"${metrics.problemConnections} problem connections, " +
        s"${metrics.recentSuccessRate}% recent success rate, " +
        s"${formatRecords(metrics.recentRecordsSynced)} records, " +
        s"${formatBytes(metrics.recentBytesSynced)} synced."
    val agentText = agentContext match {
      case "min" =>
        s"$header\n\n$summary\n\nFor drill-down, ask the user to select a row " +
          "or call `show_connection_sync_history(connection_id=...)` with a " +
          "connection ID from the dashboard."
      case "summary" =>
        val problems = statuses.filter(_.isProblem).map(_.connectionName)
        s"$header\n\n$summary\n\nProblem connection names: " +
          s"${if (problems.isEmpty) "None" else problems.take(10).mkString(", ")}."
      case _ =>
        val preview = statuses.take(WorkspaceStatusAgentPreviewLimit).map(s =>
          s"""{"connection_id":"${s.connectionId}","latest_status":"${s.latestStatus}","recent_jobs":${s.recentJobs},"success_rate":${s.successRate}}""")
        s"$header\n\n$summary\n\nAgent-only capped connection preview:\n[${preview.mkString(",")}]"
    }

    WorkspaceSyncStatusResult(
      workspaceId = ws.workspaceId,
      connections = statuses,
      metrics = metrics,
      statusPie = pie,
      agentText = agentText,
      modelPreview = statuses.take(WorkspaceStatusAgentPreviewLimit),
      modelPreviewTruncated = statuses.size > WorkspaceStatusAgentPreviewLimit,
      uiRendered = !suppressUi,
      session = new DashboardSession(statuses))
  }

  // ------------------------------------------------------------------
  // MCP prompts (reference mcp/prompts.py:16-87)
  // ------------------------------------------------------------------

  private val TestMyToolsGuidance =
    """You are testing the MCP tools available in this session.
      |
      |Focus on validating that tools:
      |1. Accept their required parameters correctly
      |2. Return expected output formats
      |3. Handle errors gracefully
      |4. Connect to required services (if applicable)
      |
      |Be efficient and practical in your testing approach.""".stripMargin

  /** `test-my-tools` prompt (prompts.py:55-87): the one registered
    * prompt — guidance text with an optional free-form scope appendix,
    * returned as role/content message pairs. */
  def testMyToolsPrompt(scope: Option[String] = None): Seq[(String, String)] = {
    val content = scope match {
      case Some(s) if s.nonEmpty =>
        s"$TestMyToolsGuidance\n\n---\n\nAdditional scope or constraints:\n$s"
      case _ => TestMyToolsGuidance
    }
    Seq("user" -> content)
  }
}
