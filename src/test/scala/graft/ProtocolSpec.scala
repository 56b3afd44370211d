package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.protocol._

/** Protocol parsing + catalog resolution (SURVEY §1.1, §2.10). */
class ProtocolSpec extends AnyFunSuite {

  test("RECORD message parses stream, data payload, emitted_at") {
    val line =
      """{"type":"RECORD","record":{"stream":"users","data":{"id":1,"name":"a"},"emitted_at":1700000000000}}"""
    val m = AirbyteMessage.parse(line).get
    assert(m.messageType == MessageType.RECORD)
    assert(m.streamName.contains("users"))
    assert(m.dataJson.contains("""{"id":1,"name":"a"}"""))
    assert(m.emittedAt.contains(1700000000000L))
  }

  test("STATE message carries stream descriptor and state blob") {
    val line =
      """{"type":"STATE","state":{"type":"STREAM","stream":{"stream_descriptor":{"name":"users"},"stream_state":{"cursor":5}}}}"""
    val m = AirbyteMessage.parse(line).get
    assert(m.messageType == MessageType.STATE)
    assert(m.streamName.contains("users"))
    assert(m.stateJson.exists(_.contains(""""cursor":5""")))
  }

  test("TRACE stream_status COMPLETE parses") {
    val line =
      """{"type":"TRACE","trace":{"type":"STREAM_STATUS","stream_status":{"stream_descriptor":{"name":"users"},"status":"COMPLETE"}}}"""
    val m = AirbyteMessage.parse(line).get
    assert(m.messageType == MessageType.TRACE)
    assert(m.streamName.contains("users"))
    assert(m.streamStatus.contains("COMPLETE"))
  }

  test("garbage and non-JSON lines are skipped, not fatal") {
    assert(AirbyteMessage.parse("not json").isEmpty)
    assert(AirbyteMessage.parse("").isEmpty)
    assert(AirbyteMessage.parse("""{"type":"BOGUS"}""").isEmpty)
    assert(AirbyteMessage.parse("""{"no_type":1}""").isEmpty)
  }

  test("catalog JSON → configured streams with schema, PK, cursor") {
    val catalogJson =
      """{"streams":[
        |  {"name":"Users","json_schema":{"properties":{"id":{"type":"integer"},"name":{"type":"string"}}},
        |   "source_defined_primary_key":[["id"]],"default_cursor_field":["updated_at"]},
        |  {"name":"events","json_schema":{"properties":{"ts":{"type":"string","format":"date-time"}}}}
        |]}""".stripMargin
    val cat = ConfiguredCatalog.fromCatalogJson(catalogJson)
    assert(cat.streamNames == Seq("users", "events"))
    assert(cat("users").primaryKeys == Seq("id"))
    assert(cat("users").cursorField.contains("updated_at"))
    assert(cat("users").schema.fieldNames.toSeq == Seq("id", "name"))
    assert(cat.resolveWriteMethod("users", WriteStrategy.Auto) == WriteStrategy.Merge)
    assert(cat.resolveWriteMethod("events", WriteStrategy.Auto) == WriteStrategy.Replace)
  }

  test("CDC delete marker in a discovered schema drives AUTO to CdcDelete") {
    val catalogJson =
      """{"streams":[
        |  {"name":"accounts","json_schema":{"properties":{
        |     "id":{"type":"integer"},"name":{"type":"string"},
        |     "_ab_cdc_deleted_at":{"type":["null","string"],"format":"date-time"}}},
        |   "source_defined_primary_key":[["id"]],"default_cursor_field":["_ab_cdc_lsn"]},
        |  {"name":"logs","json_schema":{"properties":{
        |     "_ab_cdc_deleted_at":{"type":["null","string"]}}}}
        |]}""".stripMargin
    val cat = ConfiguredCatalog.fromCatalogJson(catalogJson)
    assert(cat("accounts").cdcDeletedAtField.contains("_ab_cdc_deleted_at"))
    assert(cat.resolveWriteMethod("accounts", WriteStrategy.Auto) == WriteStrategy.CdcDelete)
    // CDC marker without a PK cannot merge — falls through to cursor/replace
    assert(cat.resolveWriteMethod("logs", WriteStrategy.Auto) == WriteStrategy.Replace)
  }

  test("nested primary keys are rejected (catalog_providers.py:146-172)") {
    // a MULTI-NODE path (["a","b"]) is nested — the catalog parser
    // encodes it with NUL, and resolution rejects it like the reference
    val json = """{"streams":[{"name":"s","json_schema":{"type":"object",
      |"properties":{"a":{"type":"object"}}},
      |"source_defined_primary_key":[["a","b"]]}]}""".stripMargin
    val cat = ConfiguredCatalog.fromCatalogJson(json)
    assertThrows[IllegalArgumentException](cat.primaryKeys("s"))
  }

  test("a single-node PK with a literal dot is a flat column (GAds shape)") {
    // the reference's source-test fixture pins ["table1.Column1"]:
    // one node, name contains '.', normalizes to table1_column1
    val json = """{"streams":[{"name":"s","json_schema":{"type":"object",
      |"properties":{"table1.Column1":{"type":"string"}}},
      |"source_defined_primary_key":[["table1.Column1"]]}]}""".stripMargin
    val cat = ConfiguredCatalog.fromCatalogJson(json)
    assert(cat.primaryKeys("s") == Seq("table1_column1"))
  }
}
