package graft.cloud

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.cache.SparkCache
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
    attempts: Seq[AttemptInfo])

final case class ConnectionInfo(
    connectionId: String,
    sourceId: String,
    destinationId: String,
    streams: Seq[String],
    tablePrefix: String)

/** Raised by `SyncResult.raiseFailureStatus()` /
  * `CloudConnection.runSync(wait=true)` on a failed job — the analog of
  * the reference's `AirbyteConnectionSyncError`
  * (`cloud/sync_results.py:365-389`). */
final class ConnectionSyncError(
    val connectionId: String, val jobId: Long, message: String)
  extends RuntimeException(
    s"Sync of connection '$connectionId' (job $jobId) failed: $message")

/**
 * Transport abstraction over the workspace control plane — the surface
 * the reference's HTTP client exposes (`cloud/client.py:1-349`), minus
 * organization/billing shells. An HTTP implementation would be a drop-in;
 * [[LocalWorkspaceApi]] is the no-egress engine-backed one.
 */
trait WorkspaceApi {
  def deploySource(name: String, source: Source): String
  def deployDestination(name: String, cache: SparkCache): String
  def deployConnection(
      sourceId: String, destinationId: String,
      streams: Seq[String], tablePrefix: String): String
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
  /** Destination cache backing a connection (for `SyncResult.getDataset`). */
  def destinationCache(connectionId: String): SparkCache
  /** Display names as deployed (the MCP cloud tools surface them). */
  def sourceName(sourceId: String): String
  def destinationName(destinationId: String): String
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
  private val states = TrieMap.empty[(String, String), String]

  private def nextId(prefix: String): String = s"$prefix-${ids.incrementAndGet()}"

  override def deploySource(name: String, source: Source): String = {
    val id = nextId("src"); sources.put(id, (name, source)); id
  }
  override def deployDestination(name: String, cache: SparkCache): String = {
    val id = nextId("dst"); destinations.put(id, (name, cache)); id
  }
  override def deployConnection(
      sourceId: String, destinationId: String,
      streams: Seq[String], tablePrefix: String): String = {
    require(sources.contains(sourceId), s"unknown source '$sourceId'")
    require(destinations.contains(destinationId), s"unknown destination '$destinationId'")
    val id = nextId("conn")
    val src = sources(sourceId)._2
    val selected = if (streams.isEmpty) src.catalog.streamNames else streams
    connections.put(id,
      ConnectionInfo(id, sourceId, destinationId, selected, tablePrefix))
    id
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
    val (_, source) = sources(conn.sourceId)
    val (_, cache) = destinations(conn.destinationId)
    val jobId = ids.incrementAndGet()
    jobs.put(jobId, JobInfo(jobId, connectionId, JobStatus.Running, 0L, 0L, Nil))
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
        records, bytes, Seq(attempt)))
    } catch {
      case e: Exception =>
        val attempt = AttemptInfo(0, JobStatus.Failed, 0L, 0L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
        jobs.put(jobId,
          JobInfo(jobId, connectionId, JobStatus.Failed, 0L, 0L, Seq(attempt)))
    }
    jobId
  }

  override def jobInfo(jobId: Long): JobInfo =
    jobs.getOrElse(jobId, throw new NoSuchElementException(s"unknown job $jobId"))
  override def listJobs(connectionId: String): Seq[Long] =
    jobs.collect { case (id, j) if j.connectionId == connectionId => id }.toSeq.sorted
  override def streamState(connectionId: String, stream: String): Option[String] =
    states.get((connectionId, stream))
  override def setStreamState(connectionId: String, stream: String, state: String): Unit =
    states.put((connectionId, stream), state)
  override def destinationCache(connectionId: String): SparkCache =
    destinations(getConnection(connectionId).destinationId)._2
  override def sourceName(sourceId: String): String =
    sources.getOrElse(sourceId,
      throw new NoSuchElementException(s"unknown source '$sourceId'"))._1
  override def destinationName(destinationId: String): String =
    destinations.getOrElse(destinationId,
      throw new NoSuchElementException(s"unknown destination '$destinationId'"))._1
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
  def permanentlyDeleteSource(sourceId: String): Unit = api.deleteSource(sourceId)
  def permanentlyDeleteDestination(destinationId: String): Unit =
    api.deleteDestination(destinationId)
  def permanentlyDeleteConnection(conn: CloudConnection): Unit =
    api.deleteConnection(conn.connectionId)
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
}
