package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.cache.SparkCache
import graft.protocol._
import graft.sources.SubprocessSource

/**
 * Parity against the reference's own integration fixture: the
 * `source-test` connector (`reference/tests/integration_tests/fixtures/
 * source-test/source_test/run.py`) re-expressed as a shell connector
 * emitting the SAME protocol messages, gated on the SAME expected
 * records the reference pins in
 * `tests/integration_tests/test_source_test_fixture.py:109-142` —
 * lowercased columns, '.'→'_' normalization, preserved big integers,
 * null columns, and an empty table for the zero-record stream.
 */
class ReferenceFixtureSpec extends SparkTestBase {

  /** The fixture's four streams, spec, check, and records, transcribed
    * from run.py (spec/discover/check/read subcommands). */
  private def fixtureConnector(): String = {
    val script = Files.createTempFile("source-test-fixture", ".sh")
    // run.py's message constants, one per line; check succeeds iff the
    // config's apiKey starts with "test" (run.py:188-194)
    val body =
      """#!/bin/sh
        |cmd="$1"; shift
        |CONFIG=""; CATALOG=""
        |while [ $# -gt 1 ]; do
        |  case "$1" in
        |    --config) CONFIG="$2"; shift 2;;
        |    --catalog) CATALOG="$2"; shift 2;;
        |    *) shift;;
        |  esac
        |done
        |case "$cmd" in
        |spec)
        |  echo '{"type":"SPEC","spec":{"documentationUrl":"https://example.com","connectionSpecification":{"$schema":"http://json-schema.org/draft-07/schema#","type":"object","properties":{"apiKey":{"type":"string","title":"API Key","description":"The API key for the service"}}}}}'
        |  ;;
        |discover)
        |  echo '{"type":"CATALOG","catalog":{"streams":[{"name":"stream1","supported_sync_modes":["full_refresh","incremental"],"source_defined_primary_key":[["Column1"]],"source_defined_cursor":true,"default_cursor_field":["Column1"],"json_schema":{"type":"object","properties":{"Column1":{"type":"string"},"Column2":{"type":"number"},"sometimes_object":{"type":["null","string"]}}}},{"name":"stream2","supported_sync_modes":["full_refresh","incremental"],"source_defined_primary_key":[["Column1"]],"source_defined_cursor":false,"json_schema":{"type":"object","properties":{"Column1":{"type":"string"},"Column2":{"type":"number"},"empty_column":{"type":"string"},"big_number":{"type":"number"}}}},{"name":"always-empty-stream","source_defined_primary_key":[["Column1"]],"source_defined_cursor":false,"supported_sync_modes":["full_refresh"],"json_schema":{"type":"object","properties":{"Column1":{"type":"string"},"Column2":{"type":"number"},"empty_column":{"type":"string"}}}},{"name":"primary-key-with-dot","source_defined_primary_key":[["table1.Column1"]],"source_defined_cursor":false,"supported_sync_modes":["full_refresh"],"json_schema":{"type":"object","properties":{"table1.Column1":{"type":"string"},"table1.Column2":{"type":"number"},"table1.empty_column":{"type":"string"},"table1.big_number":{"type":"number"}}}}]}}'
        |  ;;
        |check)
        |  if grep -q '"apiKey"[[:space:]]*:[[:space:]]*"test' "$CONFIG"; then
        |    echo '{"type":"CONNECTION_STATUS","connectionStatus":{"status":"SUCCEEDED"}}'
        |  else
        |    echo '{"type":"CONNECTION_STATUS","connectionStatus":{"status":"FAILED","message":"An error"}}'
        |  fi
        |  ;;
        |read)
        |  echo '{"type":"LOG","log":{"level":"INFO","message":"Starting sync"}}'
        |  if grep -q '"stream1"' "$CATALOG"; then
        |    echo '{"type":"RECORD","record":{"data":{"Column1":"value1","Column2":1,"sometimes_object":"{\"nested_column\": \"nested_value\"}"},"stream":"stream1","emitted_at":1704067200}}'
        |    if grep -q 'test_fail_during_sync' "$CONFIG"; then
        |      echo "Exception: An error" >&2
        |      exit 1
        |    fi
        |    echo '{"type":"RECORD","record":{"data":{"Column1":"value2","Column2":2,"sometimes_object":"string_value"},"stream":"stream1","emitted_at":1704067200}}'
        |  fi
        |  if grep -q '"stream2"' "$CATALOG"; then
        |    echo '{"type":"RECORD","record":{"data":{"Column1":"value1","Column2":1,"empty_column":null,"big_number":1234567890123456},"stream":"stream2","emitted_at":1704067200}}'
        |  fi
        |  if grep -q '"primary-key-with-dot"' "$CATALOG"; then
        |    echo '{"type":"RECORD","record":{"data":{"table1.Column1":"value1","table1.Column2":1,"table1.empty_column":null,"table1.big_number":1234567890123456},"stream":"primary-key-with-dot","emitted_at":1704067200}}'
        |  fi
        |  ;;
        |esac
        |""".stripMargin
    Files.write(script, body.getBytes("UTF-8"))
    script.toFile.setExecutable(true)
    script.toString
  }

  private def writeJson(content: String): String = {
    val f = Files.createTempFile("fixture-config", ".json")
    Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("source-test fixture: spec → discover → check → read into the cache, golden rows") {
    val script = fixtureConnector()

    // discover → catalog (same parse path the reference drives)
    val discover = new ProcessBuilder("/bin/sh", script, "discover").start()
    val catalogMsg = scala.io.Source.fromInputStream(discover.getInputStream).mkString
    discover.waitFor()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val catalogJson = mapper.readTree(catalogMsg).get("catalog").toString
    val catalog = ConfiguredCatalog.fromCatalogJson(catalogJson)
    assert(catalog.streamNames.toSet ==
      Set("stream1", "stream2", "always_empty_stream", "primary_key_with_dot"),
      "stream names normalize like the reference's table names")
    assert(catalog("stream1").cursorField.contains("Column1"))
    assert(catalog("primary_key_with_dot").primaryKeys == Seq("table1.Column1"))

    // spec surfaces the apiKey property
    val spec = new ProcessBuilder("/bin/sh", script, "spec").start()
    val specMsg = scala.io.Source.fromInputStream(spec.getInputStream).mkString
    spec.waitFor()
    assert(mapper.readTree(specMsg).at("/spec/connectionSpecification/properties/apiKey/title")
      .asText() == "API Key")

    // check: succeeds for apiKey starting with "test", fails otherwise
    // (test_source_test_fixture.py::test_check / test_check_fail)
    val goodCfg = writeJson("""{"apiKey": "test"}""")
    val badCfg = writeJson("""{"apiKey": "wrong"}""")
    val catalogFile = writeJson(
      """{"streams":[{"stream":{"name":"stream1"}},{"stream":{"name":"stream2"}},
        |{"stream":{"name":"always-empty-stream"}},{"stream":{"name":"primary-key-with-dot"}}]}""".stripMargin)
    val src = new SubprocessSource("source-test", catalog,
      Seq("/bin/sh", script, "read", "--config", goodCfg, "--catalog", catalogFile))
    src.check(Seq("/bin/sh", script, "check", "--config", goodCfg))
    val failed = intercept[IllegalStateException] {
      src.check(Seq("/bin/sh", script, "check", "--config", badCfg))
    }
    assert(failed.getMessage.contains("An error"))

    // read → cache; assert the reference's expected_test_stream_data
    val cache = SparkCache.fresh(spark, "graft_test_reffixture")
    src.sync(cache, spark)

    val s1 = cache.table("stream1")
      .select(col("column1"), col("column2").cast("double"), col("sometimes_object"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(s1 == Seq(
      ("value1", 1.0, """{"nested_column": "nested_value"}"""),
      ("value2", 2.0, "string_value")))

    val s2 = cache.table("stream2")
      .select(col("column1"), col("column2").cast("double"),
        col("empty_column"), col("big_number").cast("long")).collect()
    assert(s2.length == 1)
    assert(s2(0).getString(0) == "value1" && s2(0).getDouble(1) == 1.0)
    assert(s2(0).isNullAt(2), "empty_column must stay null")
    assert(s2(0).getLong(3) == 1234567890123456L,
      "big_number preserved exactly (the decimal wire type keeps integer precision)")

    assert(cache.table("always_empty_stream").count() == 0,
      "zero-record stream still materializes an (empty) table")

    val dotted = cache.table("primary_key_with_dot")
    // the reference expects lowercase names with '.' replaced by '_'
    val cols = dotted.columns.toSet
    assert(Set("table1_column1", "table1_column2", "table1_empty_column",
      "table1_big_number").subsetOf(cols), s"got columns $cols")
    val d = dotted.select(col("table1_column1"), col("table1_column2").cast("double"),
      col("table1_empty_column"), col("table1_big_number").cast("long")).collect()
    assert(d.length == 1)
    assert(d(0).getString(0) == "value1" && d(0).getDouble(1) == 1.0)
    assert(d(0).isNullAt(2) && d(0).getLong(3) == 1234567890123456L)

    cache.dropAll()
  }

  test("a connector crashing mid-sync fails loudly instead of committing partial data") {
    // run.py raises after stream1's first record when apiKey is
    // "test_fail_during_sync" (test_source_test_fixture.py's
    // test_failing_path_connector_check / fail-during-sync config);
    // the reference raises AirbyteConnectorFailedError on the nonzero
    // exit — a crash must never look like a clean end-of-stream
    val script = fixtureConnector()
    val failCfg = writeJson("""{"apiKey": "test_fail_during_sync"}""")
    val catalogFile = writeJson("""{"streams":[{"stream":{"name":"stream1"}}]}""")
    val discover = new ProcessBuilder("/bin/sh", script, "discover").start()
    val catalogMsg = scala.io.Source.fromInputStream(discover.getInputStream).mkString
    discover.waitFor()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val catalog = ConfiguredCatalog.fromCatalogJson(
      mapper.readTree(catalogMsg).get("catalog").toString)
    val src = new SubprocessSource("source-test", catalog,
      Seq("/bin/sh", script, "read", "--config", failCfg, "--catalog", catalogFile))
    val cache = SparkCache.fresh(spark, "graft_test_reffail")
    val e = intercept[IllegalStateException] {
      src.sync(cache, spark, streams = Seq("stream1"))
    }
    // structured error model: exit code is a named context property
    assert(e.isInstanceOf[graft.errors.SubprocessFailedError])
    assert(e.getMessage.contains("Exit Code: 1"), e.getMessage)
    assert(e.getMessage.contains("An error"), "stderr tail must surface")
    cache.dropAll()
  }
}
