package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.logs.Logs

/** File-logging parity (reference `airbyte/logs.py`): logging root
  * resolution, structured toggle, per-connector passthrough files,
  * warn-once semantics. */
class LogsSpec extends AnyFunSuite {

  /** Point the logging root at a temp dir (and optionally enable
    * structured logging); restore the env reader in finally. */
  private def withLogEnv[T](root: String, structured: Boolean = false)(body: => T): T = {
    val prev = Logs.envReader
    Logs.envReader = {
      case Logs.EnvLoggingRoot => Some(root)
      case Logs.EnvStructuredLogging => if (structured) Some("true") else None
      case _ => None
    }
    try body finally Logs.envReader = prev
  }

  test("strToBool: reference _str_to_bool truth table") {
    for (v <- Seq("1", "true", "True", "t", "yes", "y", "on", "anything"))
      assert(Logs.strToBool(v), s"'$v' should be truthy")
    for (v <- Seq("", "0", "false", "F", "no", "N", "off", "OFF"))
      assert(!Logs.strToBool(v), s"'$v' should be falsy")
  }

  test("loggingRoot: env override wins and is created; uncreatable root -> None") {
    val tmp = Files.createTempDirectory("graft-logs").toString
    withLogEnv(s"$tmp/nested/deep") {
      assert(Logs.loggingRoot.contains(Paths.get(s"$tmp/nested/deep")))
      assert(Files.isDirectory(Paths.get(s"$tmp/nested/deep")))
    }
    // a root under a plain FILE cannot be created
    val blocker = Files.createTempFile("graft-logs-file", ".txt")
    withLogEnv(s"$blocker/sub") {
      assert(Logs.loggingRoot.isEmpty)
    }
  }

  test("passthrough logger: plain format lines land in the connector's file") {
    val tmp = Files.createTempDirectory("graft-logs").toString
    withLogEnv(tmp) {
      val lg = Logs.newPassthroughFileLogger("source-plain")
      lg.info("hello info")
      lg.error("boom error")
      val dir = Paths.get(tmp, "source-plain")
      val files = Files.list(dir).iterator().asScala.toSeq
      assert(files.size == 1)
      val name = files.head.getFileName.toString
      assert(name.startsWith("source-plain-log-") && name.endsWith(".log"))
      val lines = Files.readAllLines(files.head).asScala
      assert(lines.size == 2)
      // reference plain format: "<ts> - LEVEL - message"
      assert(lines(0).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} - INFO - hello info"""))
      assert(lines(1).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} - ERROR - boom error"""))
    }
  }

  test("structured toggle: same calls emit JSON with event/level/timestamp") {
    val tmp = Files.createTempDirectory("graft-logs").toString
    withLogEnv(tmp, structured = true) {
      val lg = Logs.newPassthroughFileLogger("source-json")
      lg.info("hello json")
      lg.error("bad json")
      val files = Files.list(Paths.get(tmp, "source-json")).iterator().asScala.toSeq
      val lines = Files.readAllLines(files.head).asScala
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n0 = m.readTree(lines(0))
      assert(n0.get("event").asText() == "hello json")
      assert(n0.get("level").asText() == "info")
      assert(n0.get("timestamp").asText()
        .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
      assert(m.readTree(lines(1)).get("level").asText() == "error")
    }
  }

  test("global logger: dated folder, announced file, info lands") {
    val tmp = Files.createTempDirectory("graft-logs").toString
    withLogEnv(tmp) {
      val lg = Logs.globalFileLogger.getOrElse(fail("no global logger"))
      lg.info("global line")
      val day = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
      val files = Files.list(Paths.get(tmp, day)).iterator().asScala.toSeq
      assert(files.exists(_.getFileName.toString.startsWith("graft-log-")))
      // memoized: second call returns the same target file
      assert(Logs.globalFileLogger.get.target == lg.target)
    }
  }

  test("warnOnce: one stderr emission per unique message") {
    val tmp = Files.createTempDirectory("graft-logs").toString
    withLogEnv(tmp) {
      val prevErr = System.err
      val buf = new java.io.ByteArrayOutputStream()
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      try {
        val msg = s"unique warning ${System.nanoTime()}"
        Logs.warnOnce(msg)
        Logs.warnOnce(msg)
        Logs.warnOnce(msg)
        val out = buf.toString("UTF-8")
        assert(out.split('\n').count(_.contains(msg)) == 1)
      } finally System.setErr(prevErr)
    }
  }

  test("no root: logger is a silent no-op, nothing throws") {
    val blocker = Files.createTempFile("graft-logs-file", ".txt")
    withLogEnv(s"$blocker/sub") {
      val lg = Logs.newPassthroughFileLogger("source-noop")
      lg.info("dropped")
      lg.error("dropped too")
      assert(lg.target.isEmpty)
    }
  }
}
