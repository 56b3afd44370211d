package graft.mcp

import org.apache.spark.sql.SparkSession

import scala.collection.immutable.ListMap

import graft.cache.SparkCache
import graft.cloud.CloudWorkspace
import graft.errors.GraftInputError
import graft.sources.Source

/**
 * MCP cloud tool set over the workspace object model — the typed
 * facade for the reference's `airbyte/mcp/cloud.py` tools (deploy /
 * connect / trigger / status / logs / list / describe / delete),
 * completing the Q6 surface next to [[LocalTools]]. As with
 * LocalTools, the FastMCP/HTTP transport shell stays out of scope
 * (zero egress); each function here is one registered tool's
 * behavior, with result shapes mirroring cloud.py's pydantic models
 * (`CloudSourceResult`/`CloudDestinationResult`/
 * `CloudConnectionResult`/sync status & logs).
 *
 * URLs are workspace-relative `local://` handles — the reference
 * builds `https://cloud.airbyte.com/...` management links
 * (`cloud.py` result models); a zero-egress workspace has no web UI,
 * but the tool contract (every result self-describes where to manage
 * the object) is kept.
 */
object CloudTools {

  final case class CloudSourceResult(id: String, name: String, url: String)
  final case class CloudDestinationResult(id: String, name: String, url: String)
  final case class CloudConnectionResult(
      id: String, name: String, url: String,
      sourceId: String, destinationId: String,
      lastJobStatus: Option[String] = None,
      lastJobId: Option[Long] = None)
  final case class CloudSyncResult(
      jobId: Long, connectionId: String, status: String,
      recordsSynced: Long, bytesSynced: Long)
  final case class CloudJobSummary(jobId: Long, status: String, recordsSynced: Long)

  private def url(ws: CloudWorkspace, kind: String, id: String): String =
    s"local://workspaces/${ws.workspaceId}/$kind/$id"

  /** `check_airbyte_cloud_workspace` (cloud.py:553): validate the
    * workspace handle answers; returns a human-readable summary. */
  def checkAirbyteCloudWorkspace(ws: CloudWorkspace): String = {
    val (s, d, c) =
      (ws.listSources().size, ws.listDestinations().size, ws.listConnections().size)
    s"Workspace '${ws.workspaceId}' reachable: $s source(s), " +
      s"$d destination(s), $c connection(s)."
  }

  /** `deploy_source_to_cloud` (cloud.py:296). */
  def deploySourceToCloud(ws: CloudWorkspace, name: String,
      source: Source): CloudSourceResult = {
    val id = ws.deploySource(name, source)
    CloudSourceResult(id, name, url(ws, "sources", id))
  }

  /** `deploy_destination_to_cloud` (cloud.py:366). */
  def deployDestinationToCloud(ws: CloudWorkspace, name: String,
      cache: SparkCache): CloudDestinationResult = {
    val id = ws.deployDestination(name, cache)
    CloudDestinationResult(id, name, url(ws, "destinations", id))
  }

  /** `deploy_noop_destination_to_cloud` (cloud.py:604): a throwaway
    * destination for connection smoke tests. */
  def deployNoopDestinationToCloud(ws: CloudWorkspace,
      spark: SparkSession): CloudDestinationResult =
    deployDestinationToCloud(ws, "noop",
      SparkCache.fresh(spark, s"graft_noop_${System.nanoTime()}"))

  /** `create_connection_on_cloud` (cloud.py:436). */
  def createConnectionOnCloud(ws: CloudWorkspace, name: String,
      sourceId: String, destinationId: String,
      streams: Seq[String] = Seq.empty): CloudConnectionResult = {
    val conn = ws.deployConnection(sourceId, destinationId, streams)
    CloudConnectionResult(conn.connectionId,
      if (name.nonEmpty) name else conn.connectionId,
      url(ws, "connections", conn.connectionId), sourceId, destinationId)
  }

  /** `run_cloud_sync` (cloud.py:499). The local transport is
    * synchronous, so `wait` only controls whether final counts are
    * included (the reference's wait=False returns a started job). */
  def runCloudSync(ws: CloudWorkspace, connectionId: String,
      wait: Boolean = true): CloudSyncResult = {
    val jobId = ws.api.triggerSync(connectionId)
    val j = ws.api.jobInfo(jobId)
    if (wait)
      CloudSyncResult(jobId, connectionId, j.status.name, j.recordsSynced, j.bytesSynced)
    else CloudSyncResult(jobId, connectionId, j.status.name, 0L, 0L)
  }

  /** `get_cloud_sync_status` (cloud.py:639): a given job, or the
    * connection's latest. */
  def getCloudSyncStatus(ws: CloudWorkspace, connectionId: String,
      jobId: Option[Long] = None): Option[CloudSyncResult] = {
    val id = jobId.orElse(ws.api.listJobs(connectionId).lastOption)
    id.map { j =>
      val info = ws.api.jobInfo(j)
      CloudSyncResult(j, connectionId, info.status.name,
        info.recordsSynced, info.bytesSynced)
    }
  }

  /** `list_cloud_sync_jobs` (cloud.py:713). */
  def listCloudSyncJobs(ws: CloudWorkspace, connectionId: String): Seq[CloudJobSummary] =
    ws.api.listJobs(connectionId).map { id =>
      val j = ws.api.jobInfo(id)
      CloudJobSummary(id, j.status.name, j.recordsSynced)
    }

  /** `get_cloud_sync_logs` (cloud.py:1023): the attempts' log lines of
    * a given job (or the latest). */
  def getCloudSyncLogs(ws: CloudWorkspace, connectionId: String,
      jobId: Option[Long] = None): String = {
    val id = jobId.orElse(ws.api.listJobs(connectionId).lastOption)
      .getOrElse(throw new NoSuchElementException(
        s"no sync jobs for connection '$connectionId'"))
    val j = ws.api.jobInfo(id)
    j.attempts.zipWithIndex.map { case (a, i) =>
      s"attempt ${i}: [${a.status.name}] ${a.logText}"
    }.mkString("\n")
  }

  /** `list_deployed_cloud_source_connectors` (cloud.py:807). */
  def listDeployedCloudSourceConnectors(ws: CloudWorkspace): Seq[CloudSourceResult] =
    ws.listSources().map(id =>
      CloudSourceResult(id, ws.api.sourceName(id), url(ws, "sources", id)))

  /** `list_deployed_cloud_destination_connectors` (cloud.py:860). */
  def listDeployedCloudDestinationConnectors(ws: CloudWorkspace): Seq[CloudDestinationResult] =
    ws.listDestinations().map(id =>
      CloudDestinationResult(id, ws.api.destinationName(id), url(ws, "destinations", id)))

  /** `list_deployed_cloud_connections` (cloud.py:1171); with
    * `withConnectionStatus` the latest job's status/id are attached
    * (the reference's `with_connection_status=True`). */
  def listDeployedCloudConnections(ws: CloudWorkspace,
      withConnectionStatus: Boolean = false): Seq[CloudConnectionResult] =
    ws.listConnections().map { c =>
      val info = ws.api.getConnection(c.connectionId)
      val last =
        if (withConnectionStatus) ws.api.listJobs(c.connectionId).lastOption
        else None
      CloudConnectionResult(c.connectionId, c.connectionId,
        url(ws, "connections", c.connectionId),
        info.sourceId, info.destinationId,
        lastJobStatus = last.map(j => ws.api.jobInfo(j).status.name),
        lastJobId = last)
    }

  /** `describe_cloud_connection` (cloud.py:985). */
  def describeCloudConnection(ws: CloudWorkspace,
      connectionId: String): Map[String, String] = {
    val c = ws.api.getConnection(connectionId)
    Map(
      "connection_id" -> c.connectionId,
      "connection_name" -> c.name,
      "url" -> url(ws, "connections", c.connectionId),
      "source_id" -> c.sourceId,
      "source_name" -> ws.api.sourceName(c.sourceId),
      "destination_id" -> c.destinationId,
      "destination_name" -> ws.api.destinationName(c.destinationId),
      "streams" -> c.streams.mkString(", "),
      "table_prefix" -> c.tablePrefix,
      "status" -> c.status,
      "schedule" -> (c.scheduleType match {
        case "cron" => s"cron: ${c.cronExpression.getOrElse("")}"
        case other  => other
      }))
  }

  /** `describe_cloud_source` (cloud.py:913-941). */
  def describeCloudSource(ws: CloudWorkspace, sourceId: String): CloudSourceResult = {
    val s = ws.getSource(sourceId)
    CloudSourceResult(sourceId, s.name, url(ws, "sources", sourceId))
  }

  /** `describe_cloud_destination` (cloud.py:949-977). */
  def describeCloudDestination(ws: CloudWorkspace,
      destinationId: String): CloudDestinationResult = {
    val d = ws.getDestination(destinationId)
    CloudDestinationResult(destinationId, d.name, url(ws, "destinations", destinationId))
  }

  // ---- connector mutation (cloud.py:2070-2238) ----------------------

  /** `rename_cloud_source` (cloud.py:2070). */
  def renameCloudSource(ws: CloudWorkspace, sourceId: String,
      name: String): CloudSourceResult = {
    ws.getSource(sourceId).rename(name)
    describeCloudSource(ws, sourceId)
  }

  /** `update_cloud_source_config` (cloud.py:2101) — destructive: can
    * break existing connections if the config is wrong. */
  def updateCloudSourceConfig(ws: CloudWorkspace, sourceId: String,
      configJson: String): CloudSourceResult = {
    ws.getSource(sourceId).updateConfig(configJson)
    describeCloudSource(ws, sourceId)
  }

  /** `rename_cloud_destination` (cloud.py:2152). */
  def renameCloudDestination(ws: CloudWorkspace, destinationId: String,
      name: String): CloudDestinationResult = {
    ws.getDestination(destinationId).rename(name)
    describeCloudDestination(ws, destinationId)
  }

  /** `update_cloud_destination_config` (cloud.py:2186). */
  def updateCloudDestinationConfig(ws: CloudWorkspace, destinationId: String,
      configJson: String): CloudDestinationResult = {
    ws.getDestination(destinationId).updateConfig(configJson)
    describeCloudDestination(ws, destinationId)
  }

  // ---- connection mutation (cloud.py:2239-2469) ---------------------

  /** `rename_cloud_connection` (cloud.py:2239). */
  def renameCloudConnection(ws: CloudWorkspace, connectionId: String,
      name: String): Map[String, String] = {
    ws.getConnection(connectionId).rename(name)
    describeCloudConnection(ws, connectionId)
  }

  /** `set_cloud_connection_table_prefix` (cloud.py:2273). */
  def setCloudConnectionTablePrefix(ws: CloudWorkspace, connectionId: String,
      prefix: String): Map[String, String] = {
    ws.getConnection(connectionId).setTablePrefix(prefix)
    describeCloudConnection(ws, connectionId)
  }

  /** `set_cloud_connection_selected_streams` (cloud.py:2312) —
    * destructive: replaces the stream selection. */
  def setCloudConnectionSelectedStreams(ws: CloudWorkspace, connectionId: String,
      streamNames: Seq[String]): Map[String, String] = {
    ws.getConnection(connectionId).setSelectedStreams(streamNames)
    describeCloudConnection(ws, connectionId)
  }

  /** `update_cloud_connection` (cloud.py:2359): enabled and/or schedule
    * in one call; at least one setting required; cron and manual are
    * mutually exclusive. Returns the change summary string. */
  def updateCloudConnection(ws: CloudWorkspace, connectionId: String,
      enabled: Option[Boolean] = None,
      cronExpression: Option[String] = None,
      manualSchedule: Option[Boolean] = None): String = {
    if (enabled.isEmpty && cronExpression.isEmpty && manualSchedule.isEmpty)
      throw new GraftInputError(
        "At least one setting must be provided: 'enabled', 'cron_expression', " +
          "or 'manual_schedule'.",
        context = ListMap("connection_id" -> connectionId))
    if (cronExpression.isDefined && manualSchedule.contains(true))
      throw new GraftInputError(
        "Cannot specify both 'cron_expression' and 'manual_schedule=True'.",
        guidance = Some("Use 'cron_expression' for scheduled syncs or " +
          "'manual_schedule=True' for manual-only syncs."),
        context = ListMap("connection_id" -> connectionId))
    val conn = ws.getConnection(connectionId)
    val changes = Seq.newBuilder[String]
    enabled.foreach { e =>
      conn.setEnabled(e)
      changes += s"status set to '${if (e) "enabled" else "disabled"}'"
    }
    cronExpression match {
      case Some(cron) =>
        conn.setSchedule(cron); changes += s"schedule set to '$cron'"
      case None if manualSchedule.contains(true) =>
        conn.setManualSchedule(); changes += "schedule set to 'manual'"
      case None => ()
    }
    s"Successfully updated connection '$connectionId': " +
      s"${changes.result().mkString(", ")}. " +
      s"URL: ${url(ws, "connections", connectionId)}"
  }

  /** `get_connection_artifact` (cloud.py:2470): `state` or `catalog`,
    * protocol format; missing artifacts report the reference's ERROR
    * strings instead of raising. */
  def getConnectionArtifact(ws: CloudWorkspace, connectionId: String,
      artifactType: String): String = {
    val conn = ws.getConnection(connectionId)
    artifactType match {
      case "state" =>
        val state = conn.dumpRawState()
        if (state == "[]")
          """{"ERROR": "No state is set for this connection (stateType: not_set)"}"""
        else state
      case "catalog" => conn.dumpRawCatalog()
      case other => throw new GraftInputError(
        s"artifact_type must be 'state' or 'catalog', got '$other'",
        context = ListMap("artifact_type" -> other))
    }
  }

  // ---- custom source definitions (cloud.py:1440-1881) ---------------

  final case class CustomSourceDefinitionResult(
      definitionId: String, name: String, definitionType: String,
      version: Option[String], hasDraft: Boolean)

  private def definitionResult(
      d: graft.cloud.CustomCloudSourceDefinition): CustomSourceDefinitionResult =
    CustomSourceDefinitionResult(
      d.definitionId, d.name, d.definitionType, d.version, d.hasDraft)

  /** `publish_custom_source_definition` (cloud.py:1440). */
  def publishCustomSourceDefinition(ws: CloudWorkspace, name: String,
      manifestYaml: String, unique: Boolean = true,
      preValidate: Boolean = true): CustomSourceDefinitionResult =
    definitionResult(
      ws.publishCustomSourceDefinition(name, manifestYaml, unique, preValidate))

  /** `list_custom_source_definitions` (cloud.py:1548). */
  def listCustomSourceDefinitions(ws: CloudWorkspace): Seq[CustomSourceDefinitionResult] =
    ws.listCustomSourceDefinitions().map(definitionResult)

  /** `get_custom_source_definition` (cloud.py:1585). */
  def getCustomSourceDefinition(ws: CloudWorkspace,
      definitionId: String): CustomSourceDefinitionResult =
    definitionResult(ws.getCustomSourceDefinition(definitionId))

  /** `get_connector_builder_draft_manifest` (cloud.py:1647): the
    * unpublished builder draft, if one exists. */
  def getConnectorBuilderDraftManifest(ws: CloudWorkspace,
      definitionId: String): Option[String] =
    ws.getCustomSourceDefinition(definitionId).draftManifest

  /** `update_custom_source_definition` (cloud.py:1692). */
  def updateCustomSourceDefinition(ws: CloudWorkspace, definitionId: String,
      manifestYaml: String): CustomSourceDefinitionResult = {
    ws.getCustomSourceDefinition(definitionId).updateDefinition(manifestYaml)
    getCustomSourceDefinition(ws, definitionId)
  }

  /** `permanently_delete_custom_source_definition` (cloud.py:1814). */
  def permanentlyDeleteCustomSourceDefinition(ws: CloudWorkspace,
      definitionId: String, safeMode: Boolean = true): Unit =
    ws.getCustomSourceDefinition(definitionId).permanentlyDelete(safeMode)

  /** `_resolve_organization_id` (cloud.py:1288): id wins; otherwise an
    * EXACT-name match must be unique. */
  private def resolveOrganization(client: graft.cloud.CloudClient,
      organizationId: Option[String],
      organizationName: Option[String]): graft.cloud.OrganizationInfo =
    (organizationId, organizationName) match {
      case (Some(id), _) => client.getOrganization(id)
      case (None, Some(name)) =>
        client.listOrganizations().filter(_.organizationName == name) match {
          case Seq(one) => one
          case Seq() => throw new NoSuchElementException(
            s"no organization named '$name'")
          case many => throw new GraftInputError(
            s"organization name '$name' is ambiguous (${many.size} matches)",
            guidance = Some("Pass organization_id to disambiguate."),
            context = ListMap("organization_name" -> name,
              "matches" -> many.size))
        }
      case (None, None) => throw new GraftInputError(
        "either organization_id or organization_name is required")
    }

  final case class CloudWorkspaceResult(id: String, name: String, organizationId: String)
  final case class CloudOrganizationResult(
      id: String, name: String, email: Option[String],
      paymentStatus: Option[String], subscriptionStatus: Option[String],
      isAccountLocked: Boolean)

  /** `list_cloud_workspaces` (cloud.py:1311): organization-scoped only
    * — the reference will not list across all organizations. */
  def listCloudWorkspaces(client: graft.cloud.CloudClient,
      organizationId: Option[String] = None,
      organizationName: Option[String] = None,
      nameContains: Option[String] = None,
      limit: Option[Int] = None): Seq[CloudWorkspaceResult] = {
    val org = resolveOrganization(client, organizationId, organizationName)
    client.listWorkspaces(org.organizationId, nameContains, limit)
      .map(w => CloudWorkspaceResult(w.workspaceId, w.workspaceName, w.organizationId))
  }

  /** `describe_cloud_organization` (cloud.py:1381): id↔name lookup +
    * billing status + the account-lock rollup. */
  def describeCloudOrganization(client: graft.cloud.CloudClient,
      organizationId: Option[String] = None,
      organizationName: Option[String] = None): CloudOrganizationResult = {
    val o = resolveOrganization(client, organizationId, organizationName)
    CloudOrganizationResult(o.organizationId, o.organizationName, o.email,
      o.paymentStatus, o.subscriptionStatus, o.isAccountLocked)
  }

  /** `permanently_delete_cloud_source` / `_destination` / `_connection`
    * (cloud.py:1882/1938/1994). Deleting a connector still referenced
    * by a connection fails, like the API would. */
  def permanentlyDeleteCloudSource(ws: CloudWorkspace, sourceId: String): Unit =
    ws.api.deleteSource(sourceId)
  def permanentlyDeleteCloudDestination(ws: CloudWorkspace, destinationId: String): Unit =
    ws.api.deleteDestination(destinationId)
  def permanentlyDeleteCloudConnection(ws: CloudWorkspace, connectionId: String): Unit =
    ws.api.deleteConnection(connectionId)
}
