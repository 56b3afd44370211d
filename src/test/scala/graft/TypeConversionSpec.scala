package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.JsonSchemaConverter
import graft.types.JsonSchemaConverter.JsonSchemaProperty

/**
 * Golden table mirrors the reference's type-translation contract
 * (`tests/unit_tests/test_type_translation.py:9-76`): JSON Schema →
 * engine type, including malformed-schema failover.
 */
class TypeConversionSpec extends AnyFunSuite {

  private def p(
      typ: Seq[String] = Seq.empty,
      format: Option[String] = None,
      airbyteType: Option[String] = None,
      items: Option[JsonSchemaProperty] = None) =
    JsonSchemaProperty(typ, format, airbyteType, items)

  val golden: Seq[(JsonSchemaProperty, DataType)] = Seq(
    p(Seq("string")) -> StringType,
    p(Seq("null", "string")) -> StringType,
    p(Seq("string"), format = Some("date")) -> DateType,
    p(Seq("string"), format = Some("date-time"),
      airbyteType = Some("timestamp_without_timezone")) -> TimestampNTZType,
    p(Seq("string"), format = Some("date-time"),
      airbyteType = Some("timestamp_with_timezone")) -> TimestampType,
    p(Seq("string"), format = Some("date-time")) -> TimestampType,
    p(Seq("string"), format = Some("time"),
      airbyteType = Some("time_without_timezone")) -> StringType,
    p(Seq("string"), format = Some("time"),
      airbyteType = Some("time_with_timezone")) -> StringType,
    p(Seq("integer")) -> LongType,
    p(Seq("null", "integer")) -> LongType,
    p(Seq("number")) -> DecimalType(38, 9),
    p(Seq("null", "number")) -> DecimalType(38, 9),
    p(Seq("boolean")) -> BooleanType,
    p(Seq("null", "boolean")) -> BooleanType,
    p(Seq("object")) -> StringType,
    p(Seq("array")) -> StringType,
    p(Seq("array"), items = Some(p(Seq("integer")))) -> ArrayType(LongType),
    p(Seq("array"), items = Some(p(Seq("string")))) -> ArrayType(StringType),
    p(airbyteType = Some("vector_array")) -> ArrayType(FloatType),
    // malformed → failover VARCHAR (reference types.py:115-117,163)
    p() -> StringType,
    p(Seq("invalid-type")) -> StringType,
    p(Seq("string", "integer")) -> StringType)

  test("golden JSON-schema → Spark type table") {
    golden.zipWithIndex.foreach { case ((prop, expected), i) =>
      assert(JsonSchemaConverter.propertyToSparkType(prop) == expected,
        s"case $i: $prop")
    }
  }

  test("schema JSON document → StructType with normalized names") {
    val json =
      """{"properties": {
        |  "Id": {"type": "integer"},
        |  "Display Name": {"type": ["null", "string"]},
        |  "score": {"type": "number"},
        |  "created_at": {"type": "string", "format": "date-time"},
        |  "tags": {"type": "array", "items": {"type": "string"}},
        |  "meta": {"type": "object"}
        |}}""".stripMargin
    val st = JsonSchemaConverter.schemaJsonToStructType(json)
    assert(st.fieldNames.toSeq ==
      Seq("id", "display_name", "score", "created_at", "tags", "meta"))
    assert(st("id").dataType == LongType)
    assert(st("display_name").dataType == StringType)
    assert(st("score").dataType == DecimalType(38, 9))
    assert(st("created_at").dataType == TimestampType)
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("meta").dataType == StringType)
    assert(st.fields.forall(_.nullable))
  }

  test("nullable union unwrap keeps subtype ordering-insensitive") {
    assert(JsonSchemaConverter.propertyToSparkType(p(Seq("null", "integer"))) == LongType)
    assert(JsonSchemaConverter.propertyToSparkType(p(Seq("integer", "null"))) == LongType)
  }
}
