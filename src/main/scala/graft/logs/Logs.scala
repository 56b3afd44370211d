package graft.logs

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Locale

import graft.names.Ulid

/**
 * Engine + per-connector file logging (reference `airbyte/logs.py:1-340`):
 *
 *  - logs root from `GRAFT_LOGGING_ROOT`, default `/tmp/graft/logs`
 *    (`logs.py:84-116` — `/tmp/airbyte/logs` on Linux/macOS); created on
 *    demand, a one-time warning and a no-op logger when creation fails;
 *  - `GRAFT_STRUCTURED_LOGGING` toggles structured JSON lines
 *    (`logs.py:29-44` `_str_to_bool`: truthy unless empty/0/false/f/no/
 *    n/off, case-insensitive);
 *  - the global engine log at `<root>/<yyyy-MM-dd>/graft-log-<suffix>.log`
 *    (`logs.py:129-205`), the per-connector passthrough log at
 *    `<root>/<connector>/<connector>-log-<suffix>.log` (`logs.py:283-339`
 *    `new_passthrough_file_logger`), both announced on stderr;
 *  - `warnOnce` — each unique warning emitted once per JVM
 *    (`logs.py:48-80`).
 *
 * Plain format mirrors the reference's
 * `%(asctime)s - %(levelname)s - %(message)s` with second precision;
 * structured format mirrors its structlog pipeline (TimeStamper +
 * add_log_level + JSONRenderer): one JSON object per line with `event`,
 * `level`, `timestamp`.
 */
object Logs {

  val EnvLoggingRoot = "GRAFT_LOGGING_ROOT"
  val EnvStructuredLogging = "GRAFT_STRUCTURED_LOGGING"

  /** Injectable environment so specs can redirect the root / toggle the
    * format without mutating the JVM environment. */
  @volatile private[graft] var envReader: String => Option[String] =
    name => sys.env.get(name)

  private val Falsy = Set("", "0", "false", "f", "no", "n", "off")

  /** Reference `_str_to_bool` (`logs.py:29-31`). */
  private[graft] def strToBool(value: String): Boolean =
    value.nonEmpty && !Falsy(value.trim.toLowerCase(Locale.ROOT))

  def structuredLogging: Boolean =
    envReader(EnvStructuredLogging).exists(strToBool)

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Emit `message` to stderr (and the global log) at most once per JVM. */
  def warnOnce(message: String): Unit =
    if (warned.add(message)) {
      System.err.println(s"WARNING: $message")
      globalFileLogger.foreach(_.warn(message))
    }

  /** The logging root, created on demand; None (after a one-time
    * warning) when it cannot be created (`logs.py:84-116`). */
  def loggingRoot: Option[Path] = {
    val root = envReader(EnvLoggingRoot).map(Paths.get(_))
      .getOrElse(Paths.get("/tmp", "graft", "logs"))
    try {
      Files.createDirectories(root)
      Some(root)
    } catch {
      case _: Exception =>
        warnOnce(s"Failed to create graft logging directory at `$root`. " +
          s"You can override the default path by setting the `$EnvLoggingRoot` " +
          "environment variable.")
        None
    }
  }

  private val tsFormat = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss", Locale.ROOT).withZone(ZoneOffset.UTC)
  private val dayFormat = DateTimeFormatter
    .ofPattern("yyyy-MM-dd", Locale.ROOT).withZone(ZoneOffset.UTC)

  /**
   * An append-only file logger. `target = None` is the reference's
   * handler-less logger — calls are no-ops, nothing throws. Thread-safe;
   * each entry is one line, flushed per write so a crashed connector's
   * log survives.
   */
  final class FileLogger private[Logs] (
      val target: Option[Path], val structured: Boolean) {

    def info(message: String): Unit = write("info", message)
    def warn(message: String): Unit = write("warning", message)
    def error(message: String): Unit = write("error", message)

    private def write(level: String, message: String): Unit = target.foreach { p =>
      val ts = tsFormat.format(Instant.now())
      val line =
        if (structured) {
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = m.createObjectNode()
          node.put("event", message)
          node.put("level", level)
          node.put("timestamp", ts)
          node.toString
        } else s"$ts - ${level.toUpperCase(Locale.ROOT)} - $message"
      synchronized {
        try Files.write(p, (line + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        catch { case _: Exception => () }
      }
    }
  }

  private def noopLogger = new FileLogger(None, structuredLogging)

  // global logger memoized per (root, structured, day) — the reference
  // lru_caches once per process; keying on the inputs keeps redirected
  // spec environments from leaking into each other
  private val globalCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean, String), FileLogger]()

  /** The global engine logger (`logs.py:129-205`):
    * `<root>/<yyyy-MM-dd>/graft-log-<9-char ULID slice>.log`. */
  def globalFileLogger: Option[FileLogger] = loggingRoot.map { root =>
    val day = dayFormat.format(Instant.now())
    globalCache.computeIfAbsent((root.toString, structuredLogging, day), _ => {
      try {
        val folder = root.resolve(day)
        Files.createDirectories(folder)
        val path = folder.resolve(s"graft-log-${Ulid.logfileSuffix()}.log")
        System.err.println(s"Writing graft logs to file: $path")
        new FileLogger(Some(path), structuredLogging)
      } catch {
        case _: Exception =>
          warnOnce(s"Failed to create logging directory at '${root.resolve(day)}'.")
          noopLogger
      }
    })
  }

  /**
   * A fresh per-connector log file (`logs.py:283-339`
   * `new_passthrough_file_logger`):
   * `<root>/<connector>/<connector>-log-<suffix>.log`, announced on
   * stderr and in the global log. One per connector INSTANCE — each
   * source object gets its own file, like each reference connector
   * object does.
   */
  def newPassthroughFileLogger(connectorName: String): FileLogger =
    loggingRoot.map { root =>
      try {
        val folder = root.resolve(connectorName)
        Files.createDirectories(folder)
        val path = folder.resolve(
          s"$connectorName-log-${Ulid.logfileSuffix()}.log")
        val msg = s"Writing `$connectorName` logs to file: $path"
        System.err.println(msg)
        globalFileLogger.foreach(_.info(msg))
        new FileLogger(Some(path), structuredLogging)
      } catch {
        case _: Exception =>
          warnOnce(s"Failed to create connector log folder under '$root'.")
          noopLogger
      }
    }.getOrElse(noopLogger)
}
