package graft.cloud

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.cache.SparkCache
import graft.errors.{GraftConnectorError, GraftError, GraftInputError}
import graft.datasets.CachedDataset
import graft.protocol.WriteStrategy
import graft.sources.Source

/**
 * Cloud workspace client — the Spark-native analog of the reference's
 * `airbyte/cloud/workspaces.py:70-948` (`CloudWorkspace`),
 * `connections.py:273-365` (`run_sync` / `get_sync_result`), and
 * `sync_results.py:218-447` (`SyncResult` job polling + dataset access).
 *
 * The reference talks to the Airbyte Cloud REST API over HTTP
 * (`cloud/client.py`). This build is zero-egress, so the transport is a
 * trait ([[WorkspaceApi]]) and the shipped implementation
 * ([[LocalWorkspaceApi]]) executes syncs against the local engine:
 * deployed sources are [[graft.sources.Source]] instances, deployed
 * destinations are [[graft.cache.SparkCache]]s, and `run_sync` drives
 * `Source.read` through the standard write-strategy path. The object
 * model, lifecycle, and failure semantics mirror the reference; only
 * the wire protocol is out of scope (documented, not faked).
 */
sealed abstract class JobStatus(val name: String)
object JobStatus {
  /** Status vocabulary from the reference's `JobStatusEnum`
    * (`cloud/sync_results.py:276-299`, FINAL_STATUSES). */
  case object Pending extends JobStatus("pending")
  case object Running extends JobStatus("running")
  case object Succeeded extends JobStatus("succeeded")
  case object Failed extends JobStatus("failed")
  case object Cancelled extends JobStatus("cancelled")
  val finalStatuses: Set[JobStatus] = Set(Succeeded, Failed, Cancelled)
}

final case class AttemptInfo(
    attemptId: Int,
    status: JobStatus,
    recordsSynced: Long,
    bytesSynced: Long,
    logText: String)

final case class JobInfo(
    jobId: Long,
    connectionId: String,
    status: JobStatus,
    recordsSynced: Long,
    bytesSynced: Long,
    attempts: Seq[AttemptInfo],
    /** Job start wall-clock (reference `SyncResult.start_time`) — the
      * history dashboards bucket and label jobs by it. */
    startTimeMs: Long = 0L)

final case class ConnectionInfo(
    connectionId: String,
    sourceId: String,
    destinationId: String,
    streams: Seq[String],
    tablePrefix: String,
    /** Display name (reference `CloudConnectionInfo.name`). */
    name: String = "",
    /** "active" | "inactive" (reference connection status vocabulary,
      * `connections.py:807-871`). */
    status: String = "active",
    /** "manual" | "cron" (reference `build_connection_schedule`). */
    scheduleType: String = "manual",
    cronExpression: Option[String] = None)

/** Result of a connector `check` (reference `connectors.py:65-91`
  * `CheckResult`): truthy on success, stringifies to the failure. */
final case class CheckResult(
    success: Boolean, errorMessage: Option[String] = None) {
  override def toString: String =
    if (success) "Success" else s"Failed: ${errorMessage.getOrElse("unknown")}"
}

/** Raised by `SyncResult.raiseFailureStatus()` /
  * `CloudConnection.runSync(wait=true)` on a failed job — the analog of
  * the reference's `AirbyteConnectionSyncError`
  * (`cloud/sync_results.py:365-389`). */
final class ConnectionSyncError(
    val connectionId: String, val jobId: Long, detail: String)
  extends RuntimeException(
    s"Sync of connection '$connectionId' (job $jobId) failed: $detail")
  with GraftError {
  override def baseMessage: String = "The connection sync failed."
  override def guidance: Option[String] = Some(
    "Inspect the job's attempt logs, fix the connector, then re-run the sync.")
  override def context: ListMap[String, Any] =
    ListMap("connection_id" -> connectionId, "job_id" -> jobId)
  override def logText: Option[String] = Option(detail).filter(_.nonEmpty)
}

/**
 * Transport abstraction over the workspace control plane — the surface
 * the reference's HTTP client exposes (`cloud/client.py:1-349`), minus
 * organization/billing shells. An HTTP implementation would be a drop-in;
 * [[LocalWorkspaceApi]] is the no-egress engine-backed one.
 */
trait WorkspaceApi {
  def deploySource(name: String, source: Source): String
  def deployDestination(name: String, cache: SparkCache): String
  /** Deploy from a destination CONFIG document (reference
    * `deploy_destination` accepting a config dict, workspaces.py:415-444):
    * the config converts to its equivalent cache via
    * [[CacheDestinationBridge.destinationToCache]]. */
  def deployDestinationConfig(name: String, configJson: String): String
  def deployConnection(
      sourceId: String, destinationId: String,
      streams: Seq[String], tablePrefix: String,
      name: String = ""): String
  /** Partial connection update (reference `api_util.patch_connection` —
    * the one call behind rename / set_table_prefix /
    * set_selected_streams / set_enabled / set_schedule,
    * `connections.py:739-915`). Unset fields keep their value. */
  def patchConnection(
      connectionId: String,
      name: Option[String] = None,
      prefix: Option[String] = None,
      streams: Option[Seq[String]] = None,
      status: Option[String] = None,
      scheduleType: Option[String] = None,
      cronExpression: Option[String] = None): ConnectionInfo
  def listSources(): Seq[String]
  def listDestinations(): Seq[String]
  def listConnections(): Seq[ConnectionInfo]
  def getConnection(connectionId: String): ConnectionInfo
  def deleteSource(sourceId: String): Unit
  def deleteDestination(destinationId: String): Unit
  def deleteConnection(connectionId: String): Unit
  /** Start a sync job; returns the job id immediately. */
  def triggerSync(connectionId: String): Long
  def jobInfo(jobId: Long): JobInfo
  def listJobs(connectionId: String): Seq[Long]
  /** Per-stream incremental state (reference `connections.py:497-528`). */
  def streamState(connectionId: String, stream: String): Option[String]
  def setStreamState(connectionId: String, stream: String, state: String): Unit
  /** Whole-connection state artifact in the raw Config-API shape
    * (`{"stateType":…,"connectionId":…,"streamState":[…]}`) — the
    * backing for dump_raw_state/import_raw_state
    * (`connections.py:415-514`). None when no state has ever been set
    * (the reference's `stateType: not_set`). */
  def connectionStateDoc(connectionId: String): Option[String]
  def replaceConnectionStateDoc(connectionId: String, doc: String): Unit
  /** Destination cache backing a connection (for `SyncResult.getDataset`). */
  def destinationCache(connectionId: String): SparkCache
  /** Display names as deployed (the MCP cloud tools surface them). */
  def sourceName(sourceId: String): String
  def destinationName(destinationId: String): String
  /** Deployed-source handle (for catalog artifacts and checks). */
  def sourceObject(sourceId: String): Source
  // -- connector mutation (reference `connectors.py:154-344`:
  //    `patch_source` / `patch_destination` behind rename/update_config,
  //    plus `check_connector`) --
  def renameSource(sourceId: String, name: String): Unit
  def renameDestination(destinationId: String, name: String): Unit
  def sourceConfig(sourceId: String): Option[String]
  def updateSourceConfig(sourceId: String, configJson: String): Unit
  def destinationConfig(destinationId: String): Option[String]
  def updateDestinationConfig(destinationId: String, configJson: String): Unit
  def checkSource(sourceId: String): CheckResult
  def checkDestination(destinationId: String): CheckResult

  // -- custom (connector-builder) source definitions --------------------
  // Server-side workspace state (reference `workspaces.py:781-977`): the
  // registries live on the API object, not the CloudWorkspace wrapper, so
  // two workspace handles over the same api observe each other's
  // published definitions — matching the reference, where definitions
  // are stored in the workspace, not the client.
  private[cloud] val definitionRegistry =
    TrieMap.empty[String, CustomSourceDefinitionInfo]
  private[cloud] val draftRegistry = TrieMap.empty[String, String]
  private[cloud] val definitionIds = new AtomicLong(0L)
}

/**
 * Engine-backed workspace: syncs run in-process through `Source.read`
 * with the AUTO write strategy, and job bookkeeping (status transitions,
 * attempt records, record tallies) follows the reference's job model.
 * Execution is synchronous — `triggerSync` returns after the sync
 * completes, so `jobInfo` always observes a final status; the reference
 * itself offers the same blocking path via `run_sync(wait=True)`.
 */
final class LocalWorkspaceApi(spark: SparkSession) extends WorkspaceApi {
  private val ids = new AtomicLong(0L)
  private val sources = TrieMap.empty[String, (String, Source)]
  private val destinations = TrieMap.empty[String, (String, SparkCache)]
  private val connections = TrieMap.empty[String, ConnectionInfo]
  private val jobs = TrieMap.empty[Long, JobInfo]
  /** connectionId → raw Config-API state doc (the reference's server-side
    * connection state artifact; stream-level ops patch through it the
    * same way `set_stream_state` does, `connections.py:559-640`). */
  private val connStates = TrieMap.empty[String, String]
  private val sourceConfigs = TrieMap.empty[String, String]
  private val destinationConfigs = TrieMap.empty[String, String]

  private def nextId(prefix: String): String = s"$prefix-${ids.incrementAndGet()}"

  override def deploySource(name: String, source: Source): String = {
    val id = nextId("src"); sources.put(id, (name, source)); id
  }
  override def deployDestination(name: String, cache: SparkCache): String = {
    val id = nextId("dst"); destinations.put(id, (name, cache))
    // reference parity: the API serves the destination's config, which
    // for an engine-backed destination is the cache's own coordinates
    // (cache_to_destination_configuration) — SyncResult.getSqlCache
    // re-opens the cache from exactly this document
    destinationConfigs.put(id, CacheDestinationBridge.destinationConfigFor(cache))
    id
  }

  override def deployDestinationConfig(name: String, configJson: String): String =
    deployDestination(name,
      CacheDestinationBridge.destinationToCache(spark, configJson))
  override def deployConnection(
      sourceId: String, destinationId: String,
      streams: Seq[String], tablePrefix: String,
      name: String): String = {
    require(sources.contains(sourceId), s"unknown source '$sourceId'")
    require(destinations.contains(destinationId), s"unknown destination '$destinationId'")
    val id = nextId("conn")
    val src = sources(sourceId)._2
    val selected = if (streams.isEmpty) src.catalog.streamNames else streams
    connections.put(id,
      ConnectionInfo(id, sourceId, destinationId, selected, tablePrefix,
        name = if (name.nonEmpty) name else id))
    id
  }

  override def patchConnection(
      connectionId: String,
      name: Option[String], prefix: Option[String],
      streams: Option[Seq[String]], status: Option[String],
      scheduleType: Option[String], cronExpression: Option[String]): ConnectionInfo = {
    status.foreach(s => require(s == "active" || s == "inactive",
      s"invalid connection status '$s'"))
    scheduleType.foreach(s => require(s == "manual" || s == "cron",
      s"invalid schedule type '$s'"))
    val cur = getConnection(connectionId)
    streams.foreach { sel =>
      val available = sources(cur.sourceId)._2.catalog.streamNames
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val missing = sel.filterNot(s => available(s.toLowerCase(java.util.Locale.ROOT)))
      require(missing.isEmpty,
        s"streams not in source catalog: ${missing.mkString(", ")}")
    }
    val next = cur.copy(
      name = name.getOrElse(cur.name),
      tablePrefix = prefix.getOrElse(cur.tablePrefix),
      streams = streams.getOrElse(cur.streams),
      status = status.getOrElse(cur.status),
      scheduleType = scheduleType.getOrElse(cur.scheduleType),
      cronExpression = scheduleType match {
        case Some("manual") => None // switching to manual clears the cron
        case Some("cron")   => cronExpression.orElse(cur.cronExpression)
        case None           => cronExpression.orElse(cur.cronExpression)
      })
    connections.put(connectionId, next)
    next
  }
  override def listSources(): Seq[String] = sources.keys.toSeq.sorted
  override def listDestinations(): Seq[String] = destinations.keys.toSeq.sorted
  override def listConnections(): Seq[ConnectionInfo] =
    connections.values.toSeq.sortBy(_.connectionId)
  override def getConnection(connectionId: String): ConnectionInfo =
    connections.getOrElse(connectionId,
      throw new NoSuchElementException(s"unknown connection '$connectionId'"))
  override def deleteSource(sourceId: String): Unit = {
    require(!connections.values.exists(_.sourceId == sourceId),
      s"source '$sourceId' still referenced by a connection")
    sources.remove(sourceId); ()
  }
  override def deleteDestination(destinationId: String): Unit = {
    require(!connections.values.exists(_.destinationId == destinationId),
      s"destination '$destinationId' still referenced by a connection")
    destinations.remove(destinationId); ()
  }
  override def deleteConnection(connectionId: String): Unit = {
    connections.remove(connectionId); ()
  }

  override def triggerSync(connectionId: String): Long = {
    val conn = getConnection(connectionId)
    require(conn.status == "active",
      s"connection '$connectionId' is disabled (status=${conn.status}); enable it before syncing")
    val (_, source) = sources(conn.sourceId)
    val (_, cache) = destinations(conn.destinationId)
    val jobId = ids.incrementAndGet()
    val startedAt = System.currentTimeMillis()
    jobs.put(jobId,
      JobInfo(jobId, connectionId, JobStatus.Running, 0L, 0L, Nil, startedAt))
    try {
      val result = source.read(cache, spark, conn.streams, WriteStrategy.Auto)
      val records = result.counts.values.sum
      // bytes synced ≈ cache-side parquet bytes of the touched streams
      val bytes = conn.streams.map { s =>
        cache.table(s).queryExecution.optimizedPlan.stats.sizeInBytes
      }.map(_.min(BigInt(Long.MaxValue)).toLong).sum
      val attempt = AttemptInfo(0, JobStatus.Succeeded, records, bytes,
        s"synced ${conn.streams.size} stream(s): ${conn.streams.mkString(", ")}")
      jobs.put(jobId, JobInfo(jobId, connectionId, JobStatus.Succeeded,
        records, bytes, Seq(attempt), startedAt))
    } catch {
      case e: Exception =>
        val attempt = AttemptInfo(0, JobStatus.Failed, 0L, 0L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
        jobs.put(jobId,
          JobInfo(jobId, connectionId, JobStatus.Failed, 0L, 0L, Seq(attempt), startedAt))
    }
    jobId
  }

  override def jobInfo(jobId: Long): JobInfo =
    jobs.getOrElse(jobId, throw new NoSuchElementException(s"unknown job $jobId"))
  override def listJobs(connectionId: String): Seq[Long] =
    jobs.collect { case (id, j) if j.connectionId == connectionId => id }.toSeq.sorted
  // Stream-level state rides the whole-connection artifact exactly the
  // way the reference's set_stream_state does (connections.py:559-640):
  // fetch the full doc, patch one stream entry, replace the doc.
  private val stateMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def streamState(connectionId: String, stream: String): Option[String] =
    connStates.get(connectionId).flatMap { doc =>
      val root = stateMapper.readTree(doc)
      val entries = root.path("stateType").asText("") match {
        case "stream" => root.path("streamState")
        case "global" => root.path("globalState").path("streamStates")
        case _        => stateMapper.createArrayNode()
      }
      import scala.jdk.CollectionConverters._
      entries.elements().asScala
        .find(_.path("streamDescriptor").path("name").asText() == stream)
        .map(_.path("streamState").toString)
    }

  override def setStreamState(connectionId: String, stream: String, state: String): Unit = {
    getConnection(connectionId) // validate existence
    import scala.jdk.CollectionConverters._
    val root = connStates.get(connectionId)
      .map(stateMapper.readTree(_).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      .getOrElse {
        val n = stateMapper.createObjectNode()
        n.put("stateType", "stream")
        n.put("connectionId", connectionId)
        n.set[com.fasterxml.jackson.databind.JsonNode](
          "streamState", stateMapper.createArrayNode())
        n
      }
    val entries = root.path("stateType").asText("") match {
      case "global" => root.path("globalState").path("streamStates")
      case _        => root.path("streamState")
    }
    val updated = stateMapper.createArrayNode()
    var found = false
    entries.elements().asScala.foreach { e =>
      if (e.path("streamDescriptor").path("name").asText() == stream) {
        found = true
        val ne = stateMapper.createObjectNode()
        ne.set[com.fasterxml.jackson.databind.JsonNode]("streamDescriptor",
          e.path("streamDescriptor"))
        ne.set[com.fasterxml.jackson.databind.JsonNode]("streamState",
          stateMapper.readTree(state))
        updated.add(ne)
      } else updated.add(e)
    }
    if (!found) {
      val ne = stateMapper.createObjectNode()
      val sd = stateMapper.createObjectNode(); sd.put("name", stream)
      ne.set[com.fasterxml.jackson.databind.JsonNode]("streamDescriptor", sd)
      ne.set[com.fasterxml.jackson.databind.JsonNode]("streamState",
        stateMapper.readTree(state))
      updated.add(ne)
    }
    root.path("stateType").asText("") match {
      case "global" =>
        root.path("globalState")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .set[com.fasterxml.jackson.databind.JsonNode]("streamStates", updated)
      case _ =>
        root.set[com.fasterxml.jackson.databind.JsonNode]("streamState", updated)
    }
    connStates.put(connectionId, root.toString); ()
  }

  override def connectionStateDoc(connectionId: String): Option[String] = {
    getConnection(connectionId)
    connStates.get(connectionId)
  }
  override def replaceConnectionStateDoc(connectionId: String, doc: String): Unit = {
    getConnection(connectionId)
    // connectionId in the blob is always overridden (portable blobs,
    // reference import_raw_state :462-464)
    val root = stateMapper.readTree(doc)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.put("connectionId", connectionId)
    connStates.put(connectionId, root.toString); ()
  }

  override def destinationCache(connectionId: String): SparkCache =
    destinations(getConnection(connectionId).destinationId)._2
  override def sourceName(sourceId: String): String =
    sources.getOrElse(sourceId,
      throw new NoSuchElementException(s"unknown source '$sourceId'"))._1
  override def destinationName(destinationId: String): String =
    destinations.getOrElse(destinationId,
      throw new NoSuchElementException(s"unknown destination '$destinationId'"))._1
  override def sourceObject(sourceId: String): Source =
    sources.getOrElse(sourceId,
      throw new NoSuchElementException(s"unknown source '$sourceId'"))._2

  override def renameSource(sourceId: String, name: String): Unit = {
    val (_, s) = sources.getOrElse(sourceId,
      throw new NoSuchElementException(s"unknown source '$sourceId'"))
    sources.put(sourceId, (name, s)); ()
  }
  override def renameDestination(destinationId: String, name: String): Unit = {
    val (_, d) = destinations.getOrElse(destinationId,
      throw new NoSuchElementException(s"unknown destination '$destinationId'"))
    destinations.put(destinationId, (name, d)); ()
  }
  override def sourceConfig(sourceId: String): Option[String] = {
    sourceName(sourceId); sourceConfigs.get(sourceId)
  }
  override def updateSourceConfig(sourceId: String, configJson: String): Unit = {
    sourceName(sourceId)
    stateMapper.readTree(configJson) // must be valid JSON
    sourceConfigs.put(sourceId, configJson); ()
  }
  override def destinationConfig(destinationId: String): Option[String] = {
    destinationName(destinationId); destinationConfigs.get(destinationId)
  }
  override def updateDestinationConfig(destinationId: String, configJson: String): Unit = {
    destinationName(destinationId)
    stateMapper.readTree(configJson)
    destinationConfigs.put(destinationId, configJson); ()
  }

  /** Source check: run the connector's own `check` where it has one
    * (declarative / smoke-test), else verify the catalog is readable —
    * the closest engine-backed analog of `api_util.check_connector`. */
  override def checkSource(sourceId: String): CheckResult =
    try {
      sourceObject(sourceId) match {
        case d: graft.sources.DeclarativeSource => d.check()
        case s: graft.sources.SmokeTestSource => s.check()
        case other => require(other.catalog.streamNames.nonEmpty,
          "source declares no streams")
      }
      CheckResult(success = true)
    } catch {
      case scala.util.control.NonFatal(e) =>
        CheckResult(success = false,
          Some(Option(e.getMessage).getOrElse(e.toString)))
    }

  /** Destination check: the backing cache must accept a round-trip
    * (database reachable and writable). */
  override def checkDestination(destinationId: String): CheckResult =
    try {
      val (_, cache) = destinations.getOrElse(destinationId,
        throw new NoSuchElementException(s"unknown destination '$destinationId'"))
      cache.reopen()
      CheckResult(success = true)
    } catch {
      case scala.util.control.NonFatal(e) =>
        CheckResult(success = false,
          Some(Option(e.getMessage).getOrElse(e.toString)))
    }
}

/**
 * Workspace handle (reference `cloud/workspaces.py:70`): deploy/list/
 * delete sources, destinations, and connections; hand out
 * [[CloudConnection]]s.
 */
final class CloudWorkspace(val workspaceId: String, val api: WorkspaceApi) {
  def deploySource(name: String, source: Source): String =
    api.deploySource(name, source)
  def deployDestination(name: String, cache: SparkCache): String =
    api.deployDestination(name, cache)
  /** Deploy from a destination config document (the reference's
    * config-dict `deploy_destination` path). */
  def deployDestinationConfig(name: String, configJson: String): String =
    api.deployDestinationConfig(name, configJson)
  /** Reference `deploy_connection` (`workspaces.py:541-591`): bind a
    * deployed source to a deployed destination over selected streams. */
  def deployConnection(
      sourceId: String, destinationId: String,
      streams: Seq[String] = Seq.empty,
      tablePrefix: String = ""): CloudConnection = {
    val id = api.deployConnection(sourceId, destinationId, streams, tablePrefix)
    new CloudConnection(this, id)
  }
  def getConnection(connectionId: String): CloudConnection = {
    api.getConnection(connectionId) // validates existence
    new CloudConnection(this, connectionId)
  }
  def listSources(): Seq[String] = api.listSources()
  def listDestinations(): Seq[String] = api.listDestinations()
  def listConnections(): Seq[CloudConnection] =
    api.listConnections().map(c => new CloudConnection(this, c.connectionId))
  /** Typed connector handles (reference `workspaces.py` get_source /
    * get_destination → CloudSource/CloudDestination). */
  def getSource(sourceId: String): CloudSource = {
    api.sourceName(sourceId) // validates existence
    new CloudSource(this, sourceId)
  }
  def getDestination(destinationId: String): CloudDestination = {
    api.destinationName(destinationId)
    new CloudDestination(this, destinationId)
  }
  def permanentlyDeleteSource(sourceId: String): Unit = api.deleteSource(sourceId)
  def permanentlyDeleteDestination(destinationId: String): Unit =
    api.deleteDestination(destinationId)
  def permanentlyDeleteConnection(conn: CloudConnection): Unit =
    api.deleteConnection(conn.connectionId)

  // ---- custom (connector-builder) source definitions ----------------
  // Reference `workspaces.py:781-977`: publish / list / get YAML
  // manifest definitions; see [[CustomCloudSourceDefinition]] for the
  // per-definition lifecycle.

  private[cloud] def definitionRegistry = api.definitionRegistry
  private[cloud] def draftRegistry = api.draftRegistry
  private def definitionIds = api.definitionIds

  /** `publish_custom_source_definition` (:781-887): validate the
    * manifest client-side, enforce name uniqueness, register. */
  def publishCustomSourceDefinition(
      name: String,
      manifestYaml: String,
      unique: Boolean = true,
      preValidate: Boolean = true): CustomCloudSourceDefinition = {
    if (preValidate) CustomSourceDefinitions.validateManifest(manifestYaml)
    if (unique && definitionRegistry.values.exists(_.name == name))
      throw new GraftInputError(
        s"Duplicate custom_source_definition resource: '$name'",
        guidance = Some("Pass unique=false to allow a same-named " +
          "definition, or pick a new name."),
        context = ListMap("definition_name" -> name))
    val id = s"def-${definitionIds.incrementAndGet()}"
    definitionRegistry.put(id, CustomSourceDefinitionInfo(
      id, name, manifestYaml,
      CustomSourceDefinitions.manifestVersion(manifestYaml)))
    new CustomCloudSourceDefinition(this, id)
  }

  /** `list_custom_source_definitions` (:888-917). */
  def listCustomSourceDefinitions(): Seq[CustomCloudSourceDefinition] =
    definitionRegistry.keys.toSeq.sorted
      .map(new CustomCloudSourceDefinition(this, _))

  /** `get_custom_source_definition` (:919-947). */
  def getCustomSourceDefinition(definitionId: String): CustomCloudSourceDefinition = {
    require(definitionRegistry.contains(definitionId),
      s"unknown custom source definition '$definitionId'")
    new CustomCloudSourceDefinition(this, definitionId)
  }
}

/** Deployed connection (reference `cloud/connections.py:45-935`). */
final class CloudConnection(val workspace: CloudWorkspace, val connectionId: String) {
  private def api = workspace.api

  def info: ConnectionInfo = api.getConnection(connectionId)
  def streamNames: Seq[String] = info.streams

  /** Trigger a sync (reference `run_sync`, `connections.py:273-310`).
    * With `wait`, polls to a final status and raises on failure. */
  def runSync(wait: Boolean = true, timeoutMs: Long = 300000L): SyncResult = {
    val jobId = api.triggerSync(connectionId)
    val result = new SyncResult(api, connectionId, jobId)
    if (wait) {
      result.waitForCompletion(timeoutMs)
      result.raiseFailureStatus()
    }
    result
  }

  /** Latest sync result, if any (reference `get_sync_result`,
    * `connections.py:365-400`). */
  def getSyncResult(jobId: Option[Long] = None): Option[SyncResult] = {
    val id = jobId.orElse(api.listJobs(connectionId).lastOption)
    id.map(new SyncResult(api, connectionId, _))
  }

  /** Stream-level incremental state access (reference
    * `connections.py:497-640`: `get_stream_state` / `set_stream_state`). */
  def streamState(stream: String): Option[String] = {
    require(streamNames.contains(stream),
      s"stream '$stream' not configured on connection '$connectionId'")
    api.streamState(connectionId, stream)
  }
  def setStreamState(stream: String, state: String): Unit = {
    require(streamNames.contains(stream),
      s"stream '$stream' not configured on connection '$connectionId'")
    api.setStreamState(connectionId, stream, state)
  }

  // ---- mutation surface (reference `connections.py:739-915`) --------

  def name: String = info.name
  def tablePrefix: String = info.tablePrefix
  def source: CloudSource = new CloudSource(workspace, info.sourceId)
  def destination: CloudDestination = new CloudDestination(workspace, info.destinationId)

  /** `rename` (:739-757). Returns this connection, info refreshed. */
  def rename(newName: String): CloudConnection = {
    api.patchConnection(connectionId, name = Some(newName)); this
  }

  /** `set_table_prefix` (:759-777). */
  def setTablePrefix(prefix: String): CloudConnection = {
    api.patchConnection(connectionId, prefix = Some(prefix)); this
  }

  /** `set_selected_streams` (:779-803) — destructive: replaces the
    * stream selection; names are validated against the source catalog. */
  def setSelectedStreams(streamNames: Seq[String]): CloudConnection = {
    api.patchConnection(connectionId, streams = Some(streamNames)); this
  }

  /** `enabled` (:806-817): always a fresh fetch — another actor may
    * have toggled it. */
  def enabled: Boolean = info.status == "active"

  /** `set_enabled` (:829-871): no-op transitions are silent unless
    * `ignoreNoop=false`, which raises like the reference. */
  def setEnabled(enabled: Boolean, ignoreNoop: Boolean = true): Unit = {
    val desired = if (enabled) "active" else "inactive"
    if (info.status == desired) {
      if (ignoreNoop) return
      throw new GraftInputError(
        s"Connection is already ${if (enabled) "enabled" else "disabled"}.",
        guidance = Some("Pass ignoreNoop=true to make the transition a no-op."),
        context = ListMap("connection_id" -> connectionId,
          "status" -> info.status))
    }
    api.patchConnection(connectionId, status = Some(desired)); ()
  }

  /** `set_schedule` (:873-898) — cron scheduling. */
  def setSchedule(cronExpression: String): Unit = {
    api.patchConnection(connectionId,
      scheduleType = Some("cron"), cronExpression = Some(cronExpression)); ()
  }

  /** `set_manual_schedule` (:900-915): only manually-triggered syncs. */
  def setManualSchedule(): Unit = {
    api.patchConnection(connectionId, scheduleType = Some("manual")); ()
  }

  // ---- state artifacts (reference `connections.py:395-514`) ---------

  /** `dump_raw_state`: protocol-message array by default (the
    * `--state`-flag shape); `normalize=false` returns the raw
    * Config-API doc, directly importable. */
  def dumpRawState(normalize: Boolean = true): String = {
    val raw = api.connectionStateDoc(connectionId).getOrElse(
      s"""{"stateType":"not_set","connectionId":"$connectionId"}""")
    if (normalize) ConnectionArtifacts.normalizeStateToProtocol(raw) else raw
  }

  /** `import_raw_state` (:449-514): accepts either format; protocol
    * arrays convert; the embedded connectionId is always overridden. */
  def importRawState(stateJson: String): Unit = {
    val apiDoc =
      if (ConnectionArtifacts.isProtocolStateFormat(stateJson))
        ConnectionArtifacts.denormalizeProtocolStateToApi(stateJson, connectionId)
      else stateJson
    api.replaceConnectionStateDoc(connectionId, apiDoc)
  }

  // ---- catalog artifacts (reference `connections.py:657-737`) -------

  /** The connection's configured catalog in raw Config-API form,
    * reconstructed from the deployed source's catalog + the current
    * stream selection (the local analog of the server's syncCatalog). */
  private def syncCatalogDoc: String = {
    val src = api.sourceObject(info.sourceId)
    val selected = info.streams.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val streams = src.catalog.streams.map { cs =>
      val schemaJson = graft.mcp.LocalTools.getSourceStreamJsonSchema(src, cs.name)
      val pk =
        if (cs.primaryKeys.isEmpty) ""
        else cs.primaryKeys.map(k => s"""["$k"]""").mkString(""","sourceDefinedPrimaryKey":[""", ",", "]")
      s"""{"stream":{"name":"${cs.name}","jsonSchema":$schemaJson,""" +
        s""""supportedSyncModes":["full_refresh","incremental"]$pk},""" +
        s""""config":{"selected":${selected(cs.name.toLowerCase(java.util.Locale.ROOT))},"syncMode":"${cs.syncMode}",""" +
        s""""destinationSyncMode":"${if (cs.primaryKeys.nonEmpty) "append_dedup" else "append"}"}}"""
    }
    s"""{"streams":${streams.mkString("[", ",", "]")}}"""
  }

  /** `dump_raw_catalog` (:670-705): protocol form by default,
    * `normalize=false` for the raw Config-API form. */
  def dumpRawCatalog(normalize: Boolean = true): String =
    if (normalize) ConnectionArtifacts.normalizeCatalogToProtocol(syncCatalogDoc)
    else syncCatalogDoc

  /** Deprecated alias (`get_catalog_artifact`, :656-668). */
  def getCatalogArtifact: String = dumpRawCatalog()

  /** `import_raw_catalog` (:707-737): replaces the stream selection
    * from the catalog's selected entries (either format accepted). */
  def importRawCatalog(catalogJson: String): Unit = {
    val selected = ConnectionArtifacts.selectedStreamNames(catalogJson)
    require(selected.nonEmpty, "catalog selects no streams")
    api.patchConnection(connectionId, streams = Some(selected)); ()
  }

  /** `check_is_valid` (:152-168): the connection exists and its
    * connectors resolve. */
  def checkIsValid(): Boolean =
    try { api.getConnection(connectionId); api.sourceName(info.sourceId)
      api.destinationName(info.destinationId); true }
    catch { case scala.util.control.NonFatal(_) => false }
}

/**
 * Deployed cloud connector handles (reference `cloud/connectors.py:
 * 95-344`): name, check, rename, update_config, permanently_delete.
 */
sealed abstract class CloudConnector(
    val workspace: CloudWorkspace, val connectorId: String) {
  def connectorType: String
  def name: String
  def check(raiseOnError: Boolean = false): CheckResult
  def updateConfig(configJson: String): this.type
  def configJson: Option[String]
  def permanentlyDelete(): Unit
  protected def checkedResult(r: CheckResult, raiseOnError: Boolean): CheckResult = {
    if (raiseOnError && !r.success)
      throw new GraftConnectorError(
        s"Check failed: $r",
        guidance = Some("Inspect the connector configuration, then re-run " +
          "check()."),
        context = ListMap("connector_id" -> connectorId,
          "connector_type" -> connectorType))
    r
  }
}

final class CloudSource(ws: CloudWorkspace, sourceId: String)
    extends CloudConnector(ws, sourceId) {
  override def connectorType: String = "source"
  override def name: String = ws.api.sourceName(sourceId)
  def rename(newName: String): CloudSource = {
    ws.api.renameSource(sourceId, newName); this
  }
  override def updateConfig(configJson: String): this.type = {
    ws.api.updateSourceConfig(sourceId, configJson); this
  }
  override def configJson: Option[String] = ws.api.sourceConfig(sourceId)
  override def check(raiseOnError: Boolean): CheckResult =
    checkedResult(ws.api.checkSource(sourceId), raiseOnError)
  override def permanentlyDelete(): Unit = ws.permanentlyDeleteSource(sourceId)
}

final class CloudDestination(ws: CloudWorkspace, destinationId: String)
    extends CloudConnector(ws, destinationId) {
  override def connectorType: String = "destination"
  override def name: String = ws.api.destinationName(destinationId)
  def rename(newName: String): CloudDestination = {
    ws.api.renameDestination(destinationId, newName); this
  }
  override def updateConfig(configJson: String): this.type = {
    ws.api.updateDestinationConfig(destinationId, configJson); this
  }
  override def configJson: Option[String] = ws.api.destinationConfig(destinationId)
  override def check(raiseOnError: Boolean): CheckResult =
    checkedResult(ws.api.checkDestination(destinationId), raiseOnError)
  override def permanentlyDelete(): Unit =
    ws.permanentlyDeleteDestination(destinationId)
}

/**
 * Handle on one sync job (reference `cloud/sync_results.py:218-447`):
 * status polling, tallies, attempts, and typed access to the synced
 * data in the destination cache.
 */
final class SyncResult(api: WorkspaceApi, val connectionId: String, val jobId: Long) {
  def jobInfo: JobInfo = api.jobInfo(jobId)
  def isJobComplete: Boolean = JobStatus.finalStatuses.contains(jobInfo.status)
  def getJobStatus: JobStatus = jobInfo.status
  def recordsSynced: Long = jobInfo.recordsSynced
  def bytesSynced: Long = jobInfo.bytesSynced
  def getAttempts: Seq[AttemptInfo] = jobInfo.attempts
  def getFullLogText: String = jobInfo.attempts.map(_.logText).mkString("\n")

  /** Reference `wait_for_completion` (`sync_results.py:391-421`). */
  def waitForCompletion(timeoutMs: Long = 300000L): JobStatus = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!isJobComplete && System.nanoTime() < deadline) Thread.sleep(10L)
    if (!isJobComplete)
      throw new ConnectionSyncError(connectionId, jobId,
        s"still ${jobInfo.status.name} after ${timeoutMs}ms")
    jobInfo.status
  }

  /** Reference `raise_failure_status` (`sync_results.py:365-389`). */
  def raiseFailureStatus(): Unit = {
    val info = jobInfo
    if (info.status == JobStatus.Failed || info.status == JobStatus.Cancelled)
      throw new ConnectionSyncError(connectionId, jobId,
        info.attempts.lastOption.map(_.logText).getOrElse(info.status.name))
  }

  /** Reference `get_dataset` (`sync_results.py:447-460`): the synced
    * stream as a lazy dataset over the destination cache. */
  def getDataset(stream: String): CachedDataset =
    new CachedDataset(api.destinationCache(connectionId), stream)

  // memoized like the reference's `self._cache` (sync_results.py:423-430)
  @volatile private var sqlCache: SparkCache = _

  /**
   * Reference `get_sql_cache` (`sync_results.py:423-430`): open the
   * destination's data AS a cache, derived from the destination's
   * CONFIG document through [[CacheDestinationBridge.destinationToCache]]
   * — the config round-trip path, not the in-process handle (an HTTP
   * `WorkspaceApi` would serve the same config; only the SparkSession
   * comes from the engine side).
   */
  def getSqlCache: SparkCache = {
    if (sqlCache == null) {
      val destId = api.getConnection(connectionId).destinationId
      val config = api.destinationConfig(destId).getOrElse(
        throw new GraftConnectorError(
          s"destination '$destId' has no config document to open as a cache",
          guidance = Some("Only destinations registered with a config " +
            "document can back a SQL cache."),
          context = ListMap("destination_id" -> destId)))
      sqlCache = CacheDestinationBridge.destinationToCache(
        api.destinationCache(connectionId).spark, config)
    }
    sqlCache
  }

  /** Reference `get_sql_table_name` (`sync_results.py:436-438`). */
  def getSqlTableName(stream: String): String = getSqlCache.tableName(stream)
}
