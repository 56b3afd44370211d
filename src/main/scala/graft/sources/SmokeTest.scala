package graft.sources

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.SparkSession

import graft.cache.SparkCache
import graft.datasets.TableStatistics
import graft.protocol.WriteStrategy

/**
 * Destination smoke-test harness (reference
 * `airbyte/_util/destination_smoke_tests.py:453-609`
 * `run_destination_smoke_test` + `:381-450` preflight): sends the
 * scripted scenario suite at a destination namespace and reports a
 * structured result with readback statistics.
 *
 * The destination here is the engine's own Spark cache — a generated
 * `zz_deleteme_…` DATABASE plays the reference's namespace role (the
 * `zz_` prefix sorts last, `deleteme` marks it safe for automated
 * cleanup, `destination_smoke_tests.py:38-46`). Readback introspection
 * always runs, even after a failed write, to support partial-success
 * inspection (`:560-586`): per-stream row counts, column types, and
 * null/non-null tallies via the one-pass [[TableStatistics]] scan.
 */
object SmokeTest {

  val NamespacePrefix = "zz_deleteme"
  val DefaultNamespaceSuffix = "smoke_test"

  /** Preflight stream name — deliberately distinct from the predefined
    * `basic_types` stream so preflight data lands in its own table
    * (`destination_smoke_tests.py:362-367`). */
  val PreflightStreamName = "_preflight_basic_types"

  /** `zz_deleteme_yyyymmdd_hhmm_<suffix>` (`generate_namespace`, :53-71). */
  def generateNamespace(
      suffix: Option[String] = None,
      now: Instant = Instant.now()): String = {
    val ts = DateTimeFormatter.ofPattern("yyyyMMdd_HHmm")
      .withZone(ZoneOffset.UTC).format(now)
    s"${NamespacePrefix}_${ts}_${suffix.getOrElse(DefaultNamespaceSuffix)}"
  }

  /** The preflight scenario: `basic_types` schema + records under the
    * preflight stream name (`_build_preflight_scenario`, :369-399). */
  def preflightScenario: SmokeTestScenarios.Scenario = {
    val base = SmokeTestScenarios.predefined.find(_.name == "basic_types").get
    base.copy(
      name = PreflightStreamName,
      description = s"Preflight check (based on 'basic_types').")
  }

  /** Load additional scenarios from a JSON or YAML file — the CLI's
    * `--custom-scenarios-file` path (`get_smoke_test_source`,
    * `destination_smoke_tests.py:199-221`): the document is either a
    * list of scenarios or a mapping with a `custom_scenarios` key.
    * Error messages mirror the reference. */
  def loadCustomScenariosFile(path: String): Seq[SmokeTestScenarios.Scenario] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw new graft.errors.GraftInputError(
        s"Custom scenarios file not found: $path",
        guidance = Some("Pass an existing JSON or YAML file via " +
          "--custom-scenarios-file."),
        context = scala.collection.immutable.ListMap("path" -> path))
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // YAML is a JSON superset here: one mapper reads both
    val node = new com.fasterxml.jackson.dataformat.yaml.YAMLMapper().readTree(text)
    val listNode =
      if (node != null && node.isArray) node
      else if (node != null && node.isObject && node.has("custom_scenarios"))
        node.get("custom_scenarios")
      else throw new graft.errors.GraftInputError(
        "Custom scenarios file must contain a list of scenarios " +
          "or a dict with a 'custom_scenarios' key.",
        context = scala.collection.immutable.ListMap("path" -> path))
    SmokeTestSource
      .configFromJson(s"""{"custom_scenarios":${listNode.toString}}""")
      .customScenarios
  }

  /** Structured result (`DestinationSmokeTestResult`, :79-131). */
  final case class Result(
      success: Boolean,
      destination: String,
      namespace: String,
      recordsDelivered: Long,
      scenariosRequested: String,
      elapsedSeconds: Double,
      error: Option[String] = None,
      preflightPassed: Option[Boolean] = None,
      tableStatistics: Map[String, TableStatistics.TableStats] = Map.empty,
      tablesNotFound: Map[String, String] = Map.empty,
      warnings: Seq[String] = Seq.empty)

  /**
   * Run the smoke test: optional preflight write, then the selected
   * scenario suite, then readback statistics. Never throws for write
   * failures — they surface in `error`/`warnings` so a failing
   * destination still yields an inspectable result.
   */
  def run(
      spark: SparkSession,
      scenarios: String = "fast",
      namespaceSuffix: Option[String] = None,
      reuseNamespace: Option[String] = None,
      customScenarios: Seq[SmokeTestScenarios.Scenario] = Seq.empty,
      customScenariosFile: Option[String] = None,
      skipPreflight: Boolean = false,
      /** Readback introspection runs by default; callers that compute
        * their own verification over the written tables (q181) skip
        * the per-table statistics jobs. */
      collectStatistics: Boolean = true): Result = {

    val allCustom = customScenarios ++
      customScenariosFile.toSeq.flatMap(loadCustomScenariosFile)
    val namespace = reuseNamespace.getOrElse(generateNamespace(namespaceSuffix))
    val cache = new SparkCache(spark, namespace)
    cache.reopen()

    // --- preflight: basic_types under its own stream name ------------
    var preflight: Option[Boolean] = None
    if (!skipPreflight) {
      val pfSource = SmokeTestSource.forScenarios(
        scenarios = "", // no predefined scenarios, custom only
        namespace = Some(namespace),
        customScenarios = Seq(preflightScenario))
      try {
        pfSource.read(cache, spark)
        preflight = Some(true)
      } catch {
        case scala.util.control.NonFatal(e) =>
          return Result(
            success = false, destination = "spark-cache", namespace = namespace,
            recordsDelivered = 0L, scenariosRequested = scenarios,
            elapsedSeconds = 0.0,
            error = Some(s"Preflight check failed for '$PreflightStreamName': " +
              Option(e.getMessage).getOrElse(e.toString)),
            preflightPassed = Some(false))
      }
    }

    // --- main run -----------------------------------------------------
    val source = SmokeTestSource.forScenarios(
      scenarios, namespace = Some(namespace), customScenarios = allCustom)
    val streamNames = source.catalog.streamNames
    val start = System.nanoTime()
    var success = false
    var error: Option[String] = None
    var delivered = 0L
    try {
      source.read(cache, spark, streams = Seq.empty, WriteStrategy.Auto)
      delivered = source.scenarios.map(SmokeTestScenarios.recordCount).sum
      success = true
    } catch {
      case scala.util.control.NonFatal(e) =>
        error = Some(Option(e.getMessage).getOrElse(e.toString))
    }
    val elapsed = (System.nanoTime() - start) / 1e9

    // --- readback (even on failure: partial-success inspection) -------
    val warnings = Seq.newBuilder[String]
    var stats = Map.empty[String, TableStatistics.TableStats]
    var notFound = Map.empty[String, String]
    try {
      val (found, missing) = streamNames.partition(cache.tableExists)
      if (collectStatistics)
        stats = found.map(s => s -> TableStatistics.collect(cache.table(s))).toMap
      notFound = missing.map(s => s -> cache.tableName(s)).toMap
    } catch {
      case scala.util.control.NonFatal(e) =>
        warnings += s"Readback failed for destination 'spark-cache': " +
          Option(e.getMessage).getOrElse(e.toString)
    }

    Result(
      success = success, destination = "spark-cache", namespace = namespace,
      recordsDelivered = delivered, scenariosRequested = scenarios,
      elapsedSeconds = math.round(elapsed * 100) / 100.0,
      error = error, preflightPassed = preflight,
      tableStatistics = stats, tablesNotFound = notFound,
      warnings = warnings.result())
  }
}
