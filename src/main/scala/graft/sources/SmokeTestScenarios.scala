package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Predefined destination-regression scenarios — the reference's
 * adversarial gauntlet for exactly the type-conversion and
 * name-normalization code an ELT engine must keep honest
 * (reference `airbyte/cli/smoke_test_source/_scenarios.py:20-711`:
 * stream name + JSON schema + optional primary key + inline records or
 * a record generator).
 *
 * Record payloads are carried as JSON TEXT, not Scala structures — the
 * wire form is the contract under test (the engine's `from_json`
 * normalization path must survive these bytes), and inline records are
 * scenario-sized (≤7 rows) so driver-side literals are correct at any
 * corpus scale. The two generators are the exception:
 * `large_batch` materializes DISTRIBUTED via `spark.range` → `to_json`
 * (the reference generates 1000 dicts in a Python list,
 * `_scenarios.py:714-728`; a configurable count must not become a
 * driver allocation here), and `large_strings` builds its ~100 KB
 * values programmatically (`_scenarios.py:731-750`).
 */
object SmokeTestScenarios {

  /** One scenario: a stream definition plus its scripted data. */
  final case class Scenario(
      name: String,
      description: String,
      /** JSON-schema document text (`{"type":"object","properties":…}`). */
      schemaJson: String,
      /** `[["id"]]`-style key paths; None = no primary key. */
      primaryKey: Option[Seq[Seq[String]]],
      /** Inline record payloads, one JSON object per element. */
      records: Seq[String] = Seq.empty,
      recordGenerator: Option[String] = None,
      recordCount: Int = DefaultLargeBatchCount,
      highVolume: Boolean = false)

  /** `_DEFAULT_LARGE_BATCH_COUNT` (_scenarios.py:14). */
  val DefaultLargeBatchCount = 1000

  /** `HIGH_VOLUME_SCENARIO_NAMES` (_scenarios.py:16-18). */
  val HighVolumeScenarioNames: Set[String] = Set("large_batch_stream")

  private def schema(props: String): String =
    s"""{"$$schema":"http://json-schema.org/draft-07/schema#","type":"object","properties":{$props}}"""

  private val pkId = Some(Seq(Seq("id")))

  /** math.pi to the shortest round-trip double repr (the JSON bytes the
    * reference source emits for `math.pi`). */
  private val Pi = "3.141592653589793"

  /** The two reference long column names (_scenarios.py:435-446). */
  private final val LongColA =
    "a_very_long_column_name_that_exceeds_typical_database_limits_and_should_be_truncated_or_handled_gracefully_by_the_destination"
  private final val LongColB =
    "another_extremely_verbose_column_name_designed_to_test_the_absolute_maximum_length_that_any_reasonable_database_would_support"

  val predefined: Seq[Scenario] = Seq(
    Scenario(
      name = "basic_types",
      description = "Covers fundamental column types: string, integer, number, boolean.",
      schemaJson = schema(
        """"id":{"type":"integer"},"name":{"type":"string"},"amount":{"type":"number"},"is_active":{"type":"boolean"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"name":"Alice","amount":100.50,"is_active":true}""",
        """{"id":2,"name":"Bob","amount":0.0,"is_active":false}""",
        """{"id":3,"name":"","amount":-99.99,"is_active":true}""")),
    Scenario(
      name = "timestamp_types",
      description = "Covers date and timestamp formats including ISO 8601 variations.",
      schemaJson = schema(
        """"id":{"type":"integer"},"created_date":{"type":"string","format":"date"},"updated_at":{"type":"string","format":"date-time"},"epoch_seconds":{"type":"integer"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"created_date":"2024-01-15","updated_at":"2024-01-15T10:30:00Z","epoch_seconds":1705312200}""",
        """{"id":2,"created_date":"1970-01-01","updated_at":"1970-01-01T00:00:00+00:00","epoch_seconds":0}""",
        """{"id":3,"created_date":"2099-12-31","updated_at":"2099-12-31T23:59:59.999999Z","epoch_seconds":4102444799}""")),
    Scenario(
      name = "large_decimals_and_numbers",
      description = "Tests handling of very large numbers, high precision decimals, and boundary values.",
      schemaJson = schema(
        """"id":{"type":"integer"},"big_integer":{"type":"integer"},"precise_decimal":{"type":"number"},"small_decimal":{"type":"number"}"""),
      primaryKey = pkId,
      records = Seq(
        s"""{"id":1,"big_integer":9999999999999999,"precise_decimal":$Pi,"small_decimal":0.000001}""",
        """{"id":2,"big_integer":-9999999999999999,"precise_decimal":-0.1,"small_decimal":1e-10}""",
        """{"id":3,"big_integer":0,"precise_decimal":99999999.99999999,"small_decimal":0.0}""")),
    Scenario(
      name = "nested_json_objects",
      description = "Tests nested object and array handling in destination columns.",
      schemaJson = schema(
        """"id":{"type":"integer"},""" +
        """"metadata":{"type":"object","properties":{"source":{"type":"string"},"tags":{"type":"array","items":{"type":"string"}}}},""" +
        """"nested_deep":{"type":"object","properties":{"level1":{"type":"object","properties":{"level2":{"type":"object","properties":{"value":{"type":"string"}}}}}}},""" +
        """"items_array":{"type":"array","items":{"type":"object","properties":{"sku":{"type":"string"},"qty":{"type":"integer"}}}}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"metadata":{"source":"api","tags":["a","b","c"]},"nested_deep":{"level1":{"level2":{"value":"deep"}}},"items_array":[{"sku":"ABC","qty":10}]}""",
        """{"id":2,"metadata":{"source":"manual","tags":[]},"nested_deep":{"level1":{"level2":{"value":""}}},"items_array":[]}""")),
    Scenario(
      name = "null_handling",
      description = "Tests null values across all column types and patterns.",
      schemaJson = schema(
        """"id":{"type":"integer"},"nullable_string":{"type":["null","string"]},"nullable_integer":{"type":["null","integer"]},"nullable_number":{"type":["null","number"]},"nullable_boolean":{"type":["null","boolean"]},"nullable_object":{"type":["null","object"],"properties":{"key":{"type":"string"}}},"always_null":{"type":["null","string"]}"""),
      primaryKey = pkId,
      records = Seq(
        s"""{"id":1,"nullable_string":"present","nullable_integer":42,"nullable_number":$Pi,"nullable_boolean":true,"nullable_object":{"key":"val"},"always_null":null}""",
        """{"id":2,"nullable_string":null,"nullable_integer":null,"nullable_number":null,"nullable_boolean":null,"nullable_object":null,"always_null":null}""",
        """{"id":3,"nullable_string":"","nullable_integer":0,"nullable_number":0.0,"nullable_boolean":false,"nullable_object":{},"always_null":null}""")),
    Scenario(
      name = "column_naming_edge_cases",
      description = "Tests special characters, casing, and reserved words in column names.",
      schemaJson = schema(
        """"id":{"type":"integer"},"CamelCaseColumn":{"type":"string"},"ALLCAPS":{"type":"string"},"snake_case_column":{"type":"string"},"column-with-dashes":{"type":"string"},"column.with.dots":{"type":"string"},"column with spaces":{"type":"string"},"select":{"type":"string"},"from":{"type":"string"},"order":{"type":"string"},"group":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"CamelCaseColumn":"camel","ALLCAPS":"caps","snake_case_column":"snake","column-with-dashes":"dashes","column.with.dots":"dots","column with spaces":"spaces","select":"reserved_select","from":"reserved_from","order":"reserved_order","group":"reserved_group"}""")),
    Scenario(
      name = "table_naming_edge_cases",
      description = "Stream with special characters in the name to test table naming.",
      schemaJson = schema(""""id":{"type":"integer"},"value":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq("""{"id":1,"value":"table_name_test"}""")),
    Scenario(
      name = "CamelCaseStreamName",
      description = "Stream with CamelCase name to test case handling.",
      schemaJson = schema(""""id":{"type":"integer"},"value":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq("""{"id":1,"value":"camel_case_stream_test"}""")),
    Scenario(
      name = "wide_table_50_columns",
      description = "Tests a wide table with 50 columns.",
      schemaJson = schema(
        """"id":{"type":"integer"},""" +
          (1 until 50).map(i => f""""col_$i%03d":{"type":["null","string"]}""").mkString(",")),
      primaryKey = pkId,
      records = Seq(
        "{\"id\":1," + (1 until 50).map(i => f""""col_$i%03d":"val_$i"""").mkString(",") + "}",
        "{\"id\":2," + (1 until 50).map(i => f""""col_$i%03d":null""").mkString(",") + "}")),
    Scenario(
      name = "empty_stream",
      description = "A stream that emits zero records, testing empty dataset handling.",
      schemaJson = schema(""""id":{"type":"integer"},"value":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq.empty),
    Scenario(
      name = "single_record_stream",
      description = "A stream with exactly one record.",
      schemaJson = schema(""""id":{"type":"integer"},"value":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq("""{"id":1,"value":"only_record"}""")),
    Scenario(
      name = "large_batch_stream",
      description = "A stream that generates a configurable number of records for batch testing.",
      schemaJson = schema(
        """"id":{"type":"integer"},"name":{"type":"string"},"value":{"type":"number"},"category":{"type":"string"}"""),
      primaryKey = pkId,
      recordGenerator = Some("large_batch"),
      recordCount = DefaultLargeBatchCount,
      highVolume = true),
    Scenario(
      name = "unicode_and_special_strings",
      description = "Tests unicode characters, emoji, escape sequences, and special string values.",
      schemaJson = schema(
        """"id":{"type":"integer"},"unicode_text":{"type":"string"},"special_chars":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"unicode_text":"Hello World","special_chars":"line1\nline2\ttab"}""",
        """{"id":2,"unicode_text":"Café naïve résumé","special_chars":"quote\"inside"}""",
        """{"id":3,"unicode_text":"你好世界","special_chars":"back\\slash"}""",
        """{"id":4,"unicode_text":"АБВГ","special_chars":""}""")),
    Scenario(
      name = "schema_with_no_primary_key",
      description = "A stream without a primary key, testing append-only behavior.",
      schemaJson = schema(
        """"event_id":{"type":"string"},"event_type":{"type":"string"},"payload":{"type":"string"}"""),
      primaryKey = None,
      records = Seq(
        """{"event_id":"evt_001","event_type":"click","payload":"{}"}""",
        """{"event_id":"evt_001","event_type":"click","payload":"{}"}""",
        """{"event_id":"evt_002","event_type":"view","payload":"{\"page\": \"home\"}"}""")),
    Scenario(
      name = "long_column_names",
      description = "Tests handling of very long column names that may exceed database limits.",
      schemaJson = schema(
        s""""id":{"type":"integer"},"$LongColA":{"type":"string"},"$LongColB":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq(
        s"""{"id":1,"$LongColA":"long_col_1","$LongColB":"long_col_2"}""")),
    Scenario(
      name = "duplicate_primary_keys",
      description = "Tests dedup behavior when multiple records share the same primary key. " +
        "Destinations should keep the latest record per key.",
      schemaJson = schema(
        """"id":{"type":"integer"},"name":{"type":"string"},"updated_value":{"type":"string"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"name":"Alice","updated_value":"first"}""",
        """{"id":2,"name":"Bob","updated_value":"first"}""",
        """{"id":1,"name":"Alice","updated_value":"second"}""",
        """{"id":3,"name":"Charlie","updated_value":"first"}""",
        """{"id":2,"name":"Bob","updated_value":"second"}""",
        """{"id":1,"name":"Alice","updated_value":"third"}""")),
    Scenario(
      name = "time_types",
      description = "Tests time-with-timezone and time-without-timezone formats. " +
        "These are commonly mishandled by destinations.",
      schemaJson = schema(
        """"id":{"type":"integer"},"time_no_tz":{"type":"string","format":"time","airbyte_type":"time_without_timezone"},"time_with_tz":{"type":"string","format":"time","airbyte_type":"time_with_timezone"},"timestamp_no_tz":{"type":"string","format":"date-time","airbyte_type":"timestamp_without_timezone"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"time_no_tz":"10:30:00","time_with_tz":"10:30:00+05:30","timestamp_no_tz":"2024-01-15T10:30:00"}""",
        """{"id":2,"time_no_tz":"00:00:00","time_with_tz":"00:00:00Z","timestamp_no_tz":"1970-01-01T00:00:00"}""",
        """{"id":3,"time_no_tz":"23:59:59.999999","time_with_tz":"23:59:59.999999-08:00","timestamp_no_tz":"2099-12-31T23:59:59.999999"}""")),
    Scenario(
      name = "union_types",
      description = "Tests columns with oneOf/anyOf schemas where a field can hold " +
        "values of different types. Union handling is a frequent source of destination bugs.",
      schemaJson = schema(
        """"id":{"type":"integer"},"string_or_integer":{"oneOf":[{"type":"string"},{"type":"integer"}]},"number_or_null":{"oneOf":[{"type":"number"},{"type":"null"}]},"object_or_string":{"oneOf":[{"type":"object","properties":{"key":{"type":"string"}}},{"type":"string"}]}"""),
      primaryKey = pkId,
      records = Seq(
        s"""{"id":1,"string_or_integer":"hello","number_or_null":$Pi,"object_or_string":{"key":"value"}}""",
        """{"id":2,"string_or_integer":42,"number_or_null":null,"object_or_string":"just_a_string"}""",
        """{"id":3,"string_or_integer":"","number_or_null":0.0,"object_or_string":{}}""")),
    Scenario(
      name = "array_of_primitives",
      description = "Tests arrays containing primitive types (strings, integers, mixed). " +
        "Complements nested_json_objects which only tests arrays of objects.",
      schemaJson = schema(
        """"id":{"type":"integer"},"string_array":{"type":"array","items":{"type":"string"}},"integer_array":{"type":"array","items":{"type":"integer"}},"mixed_array":{"type":"array"},"empty_typed_array":{"type":"array","items":{"type":"number"}}"""),
      primaryKey = pkId,
      records = Seq(
        s"""{"id":1,"string_array":["a","b","c"],"integer_array":[1,2,3],"mixed_array":["text",42,true,null,$Pi],"empty_typed_array":[]}""",
        """{"id":2,"string_array":[],"integer_array":[0,-1,999999999],"mixed_array":[{"nested":"object"},[1,2]],"empty_typed_array":[0.0,1e10,-99.99]}""",
        s"""{"id":3,"string_array":["","  ","normal"],"integer_array":[],"mixed_array":[],"empty_typed_array":[$Pi]}""")),
    Scenario(
      name = "large_string_values",
      description = "Tests handling of very long string values that may exceed " +
        "column size limits or buffer sizes in destinations.",
      schemaJson = schema(
        """"id":{"type":"integer"},"short_value":{"type":"string"},"medium_value":{"type":"string"},"large_value":{"type":"string"}"""),
      primaryKey = pkId,
      recordGenerator = Some("large_strings")),
    Scenario(
      name = "sparse_records",
      description = "Tests records where different rows have different subsets " +
        "of columns populated. Destinations must handle missing fields gracefully.",
      schemaJson = schema(
        """"id":{"type":"integer"},"col_a":{"type":["null","string"]},"col_b":{"type":["null","integer"]},"col_c":{"type":["null","number"]},"col_d":{"type":["null","boolean"]},"col_e":{"type":["null","string"]}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"col_a":"only_a"}""",
        """{"id":2,"col_b":42}""",
        s"""{"id":3,"col_c":$Pi}""",
        """{"id":4,"col_d":true}""",
        """{"id":5,"col_e":"only_e"}""",
        """{"id":6,"col_a":"all","col_b":99,"col_c":1.0,"col_d":false,"col_e":"present"}""",
        """{"id":7}""")),
    Scenario(
      name = "special_number_values",
      description = "Tests boundary and special numeric values including very large " +
        "and very small floats. These commonly break destinations that use fixed-precision numeric types.",
      schemaJson = schema(
        """"id":{"type":"integer"},"float_value":{"type":"number"},"integer_value":{"type":"integer"}"""),
      primaryKey = pkId,
      records = Seq(
        """{"id":1,"float_value":1.7976931348623157e308,"integer_value":1}""",
        """{"id":2,"float_value":5e-324,"integer_value":-1}""",
        """{"id":3,"float_value":-1.7976931348623157e308,"integer_value":0}""",
        """{"id":4,"float_value":-5e-324,"integer_value":9223372036854775807}""",
        """{"id":5,"float_value":0.0,"integer_value":-9223372036854775808}""",
        """{"id":6,"float_value":1.0,"integer_value":2147483647}""",
        """{"id":7,"float_value":-1.0,"integer_value":-2147483648}"""))
  )

  /**
   * Record payload JSONL for one scenario — generator dispatch
   * (`get_scenario_records`, _scenarios.py:753-762). Inline scenarios
   * parallelize their literal rows; `large_batch` builds its rows
   * DISTRIBUTED so a cranked-up `record_count` scales with executors.
   */
  /** Distributed large-batch generator frame: (id, payload JSON). The
    * id column stays alongside so callers can derive position-ordered
    * metadata (emitted_at) in-plan. */
  def largeBatchFrame(spark: SparkSession, count: Long): org.apache.spark.sql.DataFrame = {
    val categories = array(Seq("cat_a", "cat_b", "cat_c", "cat_d", "cat_e").map(lit): _*)
    spark.range(1, count + 1L)
      .select(col("id"),
        to_json(struct(
          col("id"),
          format_string("record_%06d", col("id")).as("name"),
          (col("id").cast("double") * 1.1).as("value"),
          element_at(categories, (col("id") % 5 + 1).cast("int")).as("category"))).as("j"))
  }

  /** Driver-side record payloads for SCENARIO-SIZED data (inline rows
    * and the 2-row large_strings generator). `large_batch` has no
    * driver-side form — its count is configurable and must stay
    * distributed ([[largeBatchFrame]]). */
  def recordStrings(s: Scenario): Seq[String] = s.recordGenerator match {
    case Some("large_batch") =>
      throw new graft.errors.GraftInputError(
        "large_batch records are generated distributed; use largeBatchFrame",
        context = scala.collection.immutable.ListMap(
          "scenario" -> s.name, "record_generator" -> "large_batch"))
    case Some("large_strings") =>
      val quick = ("The quick brown fox jumps over the lazy dog. " * 250).trim
      val pack = ("Pack my box with five dozen liquor jugs. " * 2500).trim
      Seq(
        s"""{"id":1,"short_value":"${"x" * 1000}","medium_value":"${"y" * 10000}","large_value":"${"z" * 100000}"}""",
        s"""{"id":2,"short_value":"Hello, World!","medium_value":"$quick","large_value":"$pack"}""")
    case Some(other) =>
      throw new graft.errors.GraftInputError(
        s"unknown record generator '$other'",
        guidance = Some("Supported generators: large_batch, large_strings."),
        context = scala.collection.immutable.ListMap(
          "scenario" -> s.name, "record_generator" -> other))
    case None => s.records
  }

  def recordJsonl(spark: SparkSession, s: Scenario): Dataset[String] = {
    import spark.implicits._
    s.recordGenerator match {
      case Some("large_batch") =>
        largeBatchFrame(spark, s.recordCount.toLong).select("j").as[String]
      case _ =>
        spark.createDataset(recordStrings(s))
    }
  }

  /** Driver-side record count without materializing generator payloads. */
  def recordCount(s: Scenario): Long = s.recordGenerator match {
    case Some("large_batch")   => s.recordCount.toLong
    case Some("large_strings") => 2L
    case _                     => s.records.size.toLong
  }
}
