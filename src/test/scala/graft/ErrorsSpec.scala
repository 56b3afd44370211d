package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.errors._

/** Structured error model (reference `exceptions.py:66-186`
  * PyAirbyteError parity): every user-facing failure renders message +
  * guidance + docs hint + titled context properties + log output, stays
  * catchable under its JDK base class, and projects a PII-safe logging
  * map. */
class ErrorsSpec extends AnyFunSuite {

  test("render carries message, class, guidance, context, log output") {
    val e = new SubprocessFailedError("source-faker", 2,
      Some("line one\nline two"))
    val r = e.render
    assert(r.startsWith("The connector subprocess failed. (SubprocessFailedError)"))
    assert(r.contains("-" * 60))
    assert(r.contains("SubprocessFailedError: The connector subprocess failed."))
    assert(r.contains("Inspect the stderr tail"))
    assert(r.contains("Connector Name: 'source-faker'"))
    assert(r.contains("Exit Code: 2"))
    assert(r.contains("Log output: \n        line one\n        line two"))
    assert(e.getMessage == r, "getMessage must return the rendered block")
  }

  test("JDK base-class contracts: input vs state errors") {
    assert(new CacheSqlGuardError("Only read-only queries are allowed", "drop")
      .isInstanceOf[IllegalArgumentException])
    assert(new ManifestError("record_filter needs condition")
      .isInstanceOf[IllegalArgumentException])
    assert(new ConnectorCheckFailedError("s", "FAILED", "bad credentials")
      .isInstanceOf[IllegalStateException])
    assert(new SubprocessFailedError("s", 1)
      .isInstanceOf[IllegalStateException])
  }

  test("check failure renders status and detail; guard renders guidance") {
    val c = new ConnectorCheckFailedError("source-x", "FAILED", "bad credentials")
    assert(c.render.contains("Status: 'FAILED'"))
    assert(c.render.contains("Detail: 'bad credentials'"))
    assert(c.render.contains("re-run check()"))
    val g = new CacheSqlGuardError("Only read-only queries are allowed (got: drop)", "drop")
    assert(g.render.contains("single read-only statement"))
    assert(g.render.contains("Violation: 'drop'"))
  }

  test("context renders in insertion order beyond 4 entries") {
    // a plain immutable Map switches to HashMap above 4 entries and
    // reorders; the ListMap contract keeps getMessage deterministic
    val e = new GraftConnectorError("Boom.",
      context = scala.collection.immutable.ListMap(
        "k6" -> 6, "k2" -> 2, "k9" -> 9, "k1" -> 1, "k5" -> 5, "k3" -> 3))
    val r = e.render
    val at = Seq("K6:", "K2:", "K9:", "K1:", "K5:", "K3:").map(r.indexOf)
    assert(at.forall(_ >= 0), r)
    assert(at == at.sorted, s"context order not preserved: $at\n$r")
  }

  test("cause chain renders and survives") {
    val cause = new java.io.IOException("disk gone")
    val e = new GraftConnectorError("Read failed.", cause = cause)
    assert(e.getCause eq cause)
    assert(e.render.contains("Caused by: java.io.IOException: disk gone"))
  }

  test("safeLoggingMap keeps only the PII-safe allowlist") {
    val e = new GraftConnectorError("Boom.",
      context = scala.collection.immutable.ListMap(
        "connector_name" -> "source-x", "exit_code" -> 3,
        "api_key" -> "SECRET", "stream_name" -> "users"))
    val m = e.safeLoggingMap
    assert(m == Map("class" -> "GraftConnectorError", "message" -> "Boom.",
      "connector_name" -> "source-x", "stream_name" -> "users",
      "exit_code" -> 3))
  }

  test("existing domain exceptions join the model") {
    val s = new graft.sources.Secrets.SecretNotFoundException("MY_TOKEN")
    assert(s.isInstanceOf[GraftError])
    assert(s.render.contains("Secret Name: 'MY_TOKEN'"))
    assert(s.render.contains("Register a secret manager"))
    val t = new graft.mcp.TrustedExecution.TrustedExecutionRequiredException("run_sql_query")
    assert(t.isInstanceOf[GraftError])
    assert(t.render.contains("Feature: 'run_sql_query'"))
    assert(t.render.contains("GRAFT_MCP_TRUSTED_EXECUTION"))
  }

  test("log file path renders when provided") {
    val p = java.nio.file.Paths.get("/tmp/graft/logs/x.log")
    val e = new GraftConnectorError("Failed.", logFile = Some(p))
    assert(e.render.contains(s"Log file: ${p.toAbsolutePath}"))
  }

  // ---- whole-API adoption: every user-facing boundary throws a ----
  // ---- GraftError with named context, under its old JDK base ------

  private def asGraft(t: Throwable): GraftError = {
    assert(t.isInstanceOf[GraftError], s"${t.getClass} must join GraftError")
    t.asInstanceOf[GraftError]
  }

  test("interactive-flows boundary: input guards carry context") {
    import graft.mcp.InteractiveFlows
    val e1 = intercept[IllegalArgumentException](
      InteractiveFlows.SupportLevel.parse("gold"))
    assert(asGraft(e1).context("support_level") == "gold")
    val e2 = intercept[IllegalArgumentException](
      InteractiveFlows.parseConnectorType("pipeline"))
    assert(asGraft(e2).context("connector_type") == "pipeline")
    assert(asGraft(e2).guidance.exists(_.contains("`source`")))
  }

  test("cloud-tools boundary: mutual-exclusion guards carry guidance") {
    val ws = new graft.cloud.CloudWorkspace("w1",
      new graft.cloud.LocalWorkspaceApi(SparkTestBase.session))
    val e = intercept[IllegalArgumentException](
      graft.mcp.CloudTools.updateCloudConnection(ws, "c1",
        cronExpression = Some("0 * * * *"), manualSchedule = Some(true)))
    val g = asGraft(e)
    assert(g.context("connection_id") == "c1")
    assert(g.guidance.exists(_.contains("manual-only")))
  }

  test("local-tools boundary: config JSON errors carry context") {
    val e = intercept[IllegalArgumentException](
      graft.mcp.LocalTools.resolveConnectorConfig(
        config = Some("[1,2,3]"), configFile = None,
        configSecretName = None, configSpecJsonSchema = None))
    assert(asGraft(e).baseMessage.contains("must be an object"))
  }

  test("cache-destination bridge boundary: unsupported type carries context") {
    val spark = SparkTestBase.session
    val e = intercept[IllegalArgumentException](
      graft.cloud.CacheDestinationBridge.destinationToCache(spark,
        """{"destinationType":"oracle","database":"x"}"""))
    val g = asGraft(e)
    assert(g.context("destination_type") == "oracle")
    assert(g.guidance.exists(_.contains("Supported cache types")))
  }

  test("custom-source-definition boundary: manifest errors are ManifestError") {
    val e = intercept[ManifestError](
      graft.cloud.CustomSourceDefinitions.validateManifest("type: Wrong\nversion: 1\n"))
    assert(e.context("manifest_type") == "Wrong")
    val e2 = intercept[ManifestError](
      graft.cloud.CustomSourceDefinitions.validateManifest("version: 1\n"))
    assert(e2.context("missing_fields") == "type")
  }

  test("connection-sync error joins the model with job context and log text") {
    val e = new graft.cloud.ConnectionSyncError("conn-9", 42L, "connector exploded")
    assert(e.isInstanceOf[GraftError])
    assert(e.context == scala.collection.immutable.ListMap(
      "connection_id" -> "conn-9", "job_id" -> 42L))
    assert(e.render.contains("connector exploded"))
    assert(e.render.contains("Job Id: 42"))
  }

  test("sources boundary: smoke-test config validation names the scenario") {
    val e = intercept[IllegalArgumentException](
      graft.sources.SmokeTestSource.configFromJson(
        """{"custom_scenarios":[{"name":"s1"}]}"""))
    val g = asGraft(e)
    assert(g.baseMessage.contains("'json_schema'"))
    assert(g.context("scenario") == "s1")
    val e2 = intercept[IllegalArgumentException](
      graft.sources.SmokeTestSource.configFromJson(
        """{"custom_scenarios":[42]}"""))
    assert(asGraft(e2).context("scenario_index") == 0)
  }

  test("sources boundary: factory arg conflicts carry the source name") {
    val e = intercept[IllegalArgumentException](
      graft.sources.Sources.getSource("demo",
        localExecutable = Some(Seq("x")), sourceManifest = Some("y: 1")))
    val g = asGraft(e)
    assert(g.baseMessage.contains("mutually exclusive"))
    assert(g.context("source_name") == "demo")
  }

  test("sources boundary: secrets validation is structured") {
    val e = intercept[IllegalArgumentException](
      graft.sources.Secrets.hydrateSecrets("[1,2]"))
    val g = asGraft(e)
    assert(g.baseMessage == "config must be a JSON object")
    assert(g.context("config_node_type") == "ARRAY")
    val s = new graft.sources.Secrets.SecretString("not json")
    val e2 = intercept[IllegalArgumentException](s.parseJson)
    assert(asGraft(e2).guidance.exists(_.contains("unwrap")))
  }

  test("sources boundary: v2 data-source option validation gives wiring guidance") {
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("stream", "users"))
    val e = intercept[IllegalArgumentException](
      graft.sources.v2.ProtocolDataSource.schemaFor(opts))
    val g = asGraft(e)
    assert(g.baseMessage.contains("catalogJson"))
    assert(g.guidance.exists(_.contains("discoverJson")))
  }
}
