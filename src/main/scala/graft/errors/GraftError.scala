package graft.errors

import scala.collection.immutable.ListMap

/**
 * Structured error model (reference `airbyte/exceptions.py:66-186`
 * `PyAirbyteError`): every user-facing failure carries a short
 * message, optional `guidance` (what to do about it), an optional
 * docs `helpUrl`, a `context` map of named properties, and optional
 * connector log text/file — rendered in the reference's
 * auto-generated-properties style (`Message. (key=value)`) instead of
 * hand-built sentences, so call sites can add properties without
 * rewriting prose and structured logging stays cheap.
 *
 * Scala adaptation: a TRAIT mixed into the closest JDK exception type
 * (`IllegalArgumentException` for input errors, `IllegalStateException`
 * for runtime/connector failures) so existing `intercept`/`catch`
 * contracts keep working while the structured surface is added on top.
 * `getMessage` returns the full rendered block — `contains(...)`
 * assertions on the short message still pass.
 */
trait GraftError extends Throwable {

  /** The short, PII-free description (reference `get_message`). */
  def baseMessage: String

  /** What the user should do about it. */
  def guidance: Option[String] = None

  /** Docs link (reference `help_url`). */
  def helpUrl: Option[String] = None

  /** Named properties — the structured part (reference `context`).
    * Insertion-ordered (the reference's dict preserves insertion
    * order, and `render`/`getMessage` must be deterministic): a plain
    * immutable Map reorders above 4 entries, so the type is ListMap. */
  def context: ListMap[String, Any] = ListMap.empty

  /** Captured connector/log output, when available. */
  def logText: Option[String] = None

  /** Path to a log file with the full output, when one exists. */
  def logFile: Option[java.nio.file.Path] = None

  private def separator: String = "\n" + "-" * 60

  private def titleCase(key: String): String =
    key.split('_').filter(_.nonEmpty)
      .map(w => w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) +
        w.substring(1).toLowerCase(java.util.Locale.ROOT))
      .mkString(" ")

  private def reprOf(v: Any): String = v match {
    case s: String => s"'$s'"
    case other => String.valueOf(other)
  }

  /** Reference `__str__` parity: headline, separator, class: message,
    * indented guidance / docs link / titled context properties / log
    * output, then the cause chain. */
  final def render: String = {
    val cls = getClass.getSimpleName
    val sb = new StringBuilder
    sb.append(s"$baseMessage ($cls)").append(separator)
      .append(s"\n$cls: $baseMessage")
    guidance.foreach(g => sb.append(s"\n    $g"))
    helpUrl.foreach(u => sb.append(s"\n    More info: $u"))
    context.foreach { case (k, v) =>
      sb.append(s"\n    ${titleCase(k)}: ${reprOf(v)}")
    }
    logText.foreach { t =>
      sb.append("\n    Log output: \n")
        .append(t.linesIterator.map("        " + _).mkString("\n"))
    }
    Option(getCause).foreach(c =>
      sb.append(separator).append(s"\nCaused by: $c"))
    logFile.foreach(f =>
      sb.append(s"\n    Log file: ${f.toAbsolutePath}"))
    sb.toString
  }

  /** PII-safe structured-logging projection (reference
    * `safe_logging_dict`): class + message + the allowlisted
    * properties only. */
  final def safeLoggingMap: Map[String, Any] = {
    val safeKeys = Seq("connector_name", "stream_name", "violation", "exit_code")
    Map("class" -> getClass.getSimpleName, "message" -> baseMessage) ++
      safeKeys.flatMap(k => context.get(k).map(k -> _))
  }

  override def getMessage: String = render
}

/** Bad user input (reference `PyAirbyteInputError`): still an
  * `IllegalArgumentException` for existing catch contracts. */
class GraftInputError(
    override val baseMessage: String,
    override val guidance: Option[String] = None,
    override val context: ListMap[String, Any] = ListMap.empty,
    override val helpUrl: Option[String] = None,
    cause: Throwable = null)
  extends IllegalArgumentException(baseMessage, cause) with GraftError

/** Connector/runtime failure (reference `AirbyteConnectorError`
  * family): still an `IllegalStateException`. */
class GraftConnectorError(
    override val baseMessage: String,
    override val guidance: Option[String] = None,
    override val context: ListMap[String, Any] = ListMap.empty,
    override val logText: Option[String] = None,
    override val logFile: Option[java.nio.file.Path] = None,
    override val helpUrl: Option[String] = None,
    cause: Throwable = null)
  extends IllegalStateException(baseMessage, cause) with GraftError

/** `check` reported FAILED or emitted no status (reference
  * `AirbyteConnectorCheckFailedError`, exceptions.py:412-418). */
final class ConnectorCheckFailedError(
    connectorName: String,
    status: String,
    detail: String,
    stderrTail: Option[String] = None)
  extends GraftConnectorError(
    baseMessage = "The connector failed its connection check.",
    guidance = Some("Verify the connector configuration and credentials, " +
      "then re-run check()."),
    context = ListMap("connector_name" -> connectorName, "status" -> status) ++
      (if (detail.nonEmpty) ListMap("detail" -> detail) else ListMap.empty),
    logText = stderrTail.filter(_.nonEmpty))

/** The connector subprocess exited nonzero mid-read (reference
  * `AirbyteSubprocessFailedError`, exceptions.py:302-308). */
final class SubprocessFailedError(
    connectorName: String,
    exitCode: Int,
    stderrTail: Option[String] = None)
  extends GraftConnectorError(
    baseMessage = "The connector subprocess failed.",
    guidance = Some("Inspect the stderr tail / log file for the root " +
      "cause; partial batches from a crashed connector are never committed."),
    context = ListMap("connector_name" -> connectorName, "exit_code" -> exitCode),
    logText = stderrTail.filter(_.nonEmpty))

/** The read-only SQL guard rejected a statement (reference cache-layer
  * validation errors, exceptions.py:273-292). */
final class CacheSqlGuardError(
    override val baseMessage: String,
    statementKind: String)
  extends GraftInputError(
    baseMessage,
    guidance = Some("run_sql_query accepts a single read-only statement " +
      "(SELECT / SHOW / DESCRIBE / EXPLAIN); use the write strategies or " +
      "execute_sql for DDL."),
    context = ListMap("violation" -> statementKind))

/** A declarative manifest is structurally invalid (reference manifest
  * validation in the declarative source path). */
final class ManifestError(
    override val baseMessage: String,
    ctx: Map[String, Any] = Map.empty)
  extends GraftInputError(
    baseMessage,
    guidance = Some("Check the manifest against the declarative component " +
      "schema; the failing component is named in the context."),
    context = ListMap.from(ctx))
