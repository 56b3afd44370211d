package graft.types

import org.apache.spark.sql.types._

import scala.util.Try

/**
 * JSON Schema → Spark SQL type conversion.
 *
 * Mirrors the reference's conversion table and failover semantics
 * (PyAirbyte `airbyte/types.py:15-30` CONVERSION_MAP, `:37-96`
 * `_get_airbyte_type`, `:124-163` `to_sql_type`), re-targeted at Spark's
 * type system:
 *
 *   string                          -> StringType
 *   integer                         -> LongType
 *   number                          -> DecimalType(38, 9)
 *   boolean                         -> BooleanType
 *   string + format: date           -> DateType
 *   string + format: date-time      -> TimestampType   (UTC)
 *   airbyte_type: timestamp_without_timezone -> TimestampNTZType
 *   time_with/without_timezone      -> StringType (ISO text; Spark has no TIME)
 *   object                          -> StringType holding canonical JSON text
 *   array (item type known)         -> ArrayType(itemType)
 *   array (unknown items)           -> StringType (JSON text)
 *   vector_array                    -> ArrayType(FloatType)
 *   ["null", T] unions              -> T with nullable=true
 *   unknown / malformed             -> StringType failover (never throws)
 *
 * Schemas are *declared*, not inferred — data is coerced to the declared
 * schema downstream (reference `airbyte/sources/base.py:303-319`).
 */
object JsonSchemaConverter {

  /** Minimal JSON-schema property model (parsed from catalog JSON). */
  final case class JsonSchemaProperty(
      typ: Seq[String] = Seq.empty, // "type" may be string or array
      format: Option[String] = None,
      airbyteType: Option[String] = None,
      items: Option[JsonSchemaProperty] = None,
      properties: Map[String, JsonSchemaProperty] = Map.empty)

  /** Resolved logical (airbyte-level) type + optional array subtype. */
  final case class AirbyteType(name: String, subtype: Option[String] = None)

  /**
   * Resolve the airbyte-level logical type of a property.
   * Mirrors `_get_airbyte_type` (`airbyte/types.py:37-96`): unwraps
   * nullable unions, honors `airbyte_type` overrides, then `format`, then
   * the base JSON type; array captures an item subtype when unambiguous.
   * Throws for schemas it cannot interpret (caller applies failover).
   */
  def airbyteType(p: JsonSchemaProperty): AirbyteType = {
    // unwrap ["null", T]
    val nonNull = p.typ.filterNot(_ == "null")
    p.airbyteType match {
      case Some(at) if at.nonEmpty => AirbyteType(at)
      case _ =>
        nonNull match {
          case Seq("string") =>
            p.format match {
              case Some("date")      => AirbyteType("date")
              case Some("date-time") => AirbyteType("timestamp_with_timezone")
              case Some("time")      => AirbyteType("time_without_timezone")
              case _                 => AirbyteType("string")
            }
          case Seq("integer") => AirbyteType("integer")
          case Seq("number")  => AirbyteType("number")
          case Seq("boolean") => AirbyteType("boolean")
          case Seq("object")  => AirbyteType("object")
          case Seq("array") =>
            val sub = p.items.flatMap(i => Try(airbyteType(i).name).toOption)
            AirbyteType("array", sub)
          case _ =>
            throw new IllegalArgumentException(
              s"Could not determine airbyte type from schema: $p")
        }
    }
  }

  /** Airbyte logical type name → Spark DataType (reference `types.py:124-163`). */
  def toSparkType(at: AirbyteType): DataType = at.name match {
    case "string"                      => StringType
    case "integer"                     => LongType
    case "number"                      => DecimalType(38, 9)
    case "boolean"                     => BooleanType
    case "date"                        => DateType
    case "timestamp_with_timezone"     => TimestampType
    case "timestamp_without_timezone"  => TimestampNTZType
    case "time_with_timezone"          => StringType // no TIME in Spark; ISO text
    case "time_without_timezone"       => StringType
    case "object"                      => StringType // canonical JSON text
    case "vector_array"                => ArrayType(FloatType)
    case "array" =>
      at.subtype match {
        case Some(sub) => ArrayType(toSparkType(AirbyteType(sub)))
        case None      => StringType // JSON text
      }
    case _ => StringType // failover (reference types.py:115-117,163)
  }

  /** Full conversion with failover — never throws (reference `:163`). */
  def propertyToSparkType(p: JsonSchemaProperty): DataType =
    Try(toSparkType(airbyteType(p))).getOrElse(StringType)

  /**
   * Whole-schema conversion: `properties` map → StructType with normalized
   * top-level names; all fields nullable (JSON records may omit anything).
   */
  def toStructType(
      properties: Seq[(String, JsonSchemaProperty)],
      normalizeNames: Boolean = true): StructType = {
    val fields = properties.map { case (name, p) =>
      val n =
        if (normalizeNames) graft.names.NameNormalizer.normalize(name)
        else name
      StructField(n, propertyToSparkType(p), nullable = true)
    }
    StructType(fields)
  }

  // ---- lightweight JSON-schema JSON parsing (no external deps) ----------

  /** Parse a JSON-schema document (as jackson tree) into our model. */
  def parseProperty(node: com.fasterxml.jackson.databind.JsonNode): JsonSchemaProperty = {
    import scala.jdk.CollectionConverters._
    val typ: Seq[String] =
      if (node.has("type")) {
        val t = node.get("type")
        if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
        else Seq(t.asText())
      } else Seq.empty
    JsonSchemaProperty(
      typ = typ,
      format = Option(node.get("format")).map(_.asText()),
      airbyteType = Option(node.get("airbyte_type")).map(_.asText()),
      items = Option(node.get("items")).map(parseProperty),
      properties =
        if (node.has("properties"))
          node.get("properties").properties().asScala
            .map(e => e.getKey -> parseProperty(e.getValue)).toMap
        else Map.empty
    )
  }

  /** JSON-schema text (`{"properties": {...}}`) → StructType. */
  def schemaJsonToStructType(json: String, normalizeNames: Boolean = true): StructType = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val props =
      if (root.has("properties"))
        root.get("properties").properties().asScala.toSeq
          .map(e => e.getKey -> parseProperty(e.getValue))
      else Seq.empty
    toStructType(props, normalizeNames)
  }
}
