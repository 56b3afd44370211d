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
    assert(conn.streamState("users").contains("""{"cursor": 42}"""))
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
}
