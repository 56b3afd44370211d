package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.cache.SparkCache
import graft.sources.{SmokeTest, SmokeTestScenarios, SmokeTestSource}

/**
 * The reference's adversarial gauntlet end-to-end: every predefined
 * smoke-test scenario (`smoke_test_source/_scenarios.py`) synced
 * through the production protocol-ingest path into the cache, with
 * golden row/type assertions per scenario family (mirroring
 * `_util/destination_smoke_tests.py` readback introspection).
 */
class SmokeTestSourceSpec extends SparkTestBase {

  import spark.implicits._

  // ---- selection & validation (source.py:193-326) -------------------

  test("scenario selection: fast excludes high-volume, all includes, filter unions, custom appends") {
    val fast = SmokeTestSource.forScenarios("fast")
    assert(fast.scenarios.size == 21)
    assert(!fast.scenarios.exists(_.name == "large_batch_stream"))

    val all = SmokeTestSource.forScenarios("all")
    assert(all.scenarios.size == 22)
    assert(all.scenarios.exists(_.name == "large_batch_stream"))

    val named = SmokeTestSource.forScenarios("basic_types, large_batch_stream")
    assert(named.scenarios.map(_.name) == Seq("basic_types", "large_batch_stream"))

    // filter names union with the boolean sets (deduped)
    val union = new SmokeTestSource(sources.SmokeTestConfig(
      allFastStreams = true, scenarioFilter = Seq("large_batch_stream", "basic_types")))
    assert(union.scenarios.size == 22)
    assert(union.scenarios.count(_.name == "basic_types") == 1)

    // custom scenarios always included; empty selection fails check()
    val custom = SmokeTestSource.forScenarios("",
      customScenarios = Seq(SmokeTest.preflightScenario))
    assert(custom.scenarios.map(_.name) == Seq(SmokeTest.PreflightStreamName))
    custom.check()
    val none = SmokeTestSource.forScenarios("")
    val ex = intercept[IllegalArgumentException](none.check())
    assert(ex.getMessage.contains("No scenarios available"))
  }

  test("custom-scenario config validation mirrors the reference messages") {
    def cfg(json: String) = SmokeTestSource.configFromJson(json)
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": "nope"}"""))
      .getMessage.contains("'custom_scenarios' must be an array of objects."))
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": [42]}"""))
      .getMessage.contains("Custom scenario at index 0 must be an object."))
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": [{"json_schema":{}}]}"""))
      .getMessage.contains("missing 'name'"))
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": [{"name":"x","json_schema":"s"}]}"""))
      .getMessage.contains("must provide 'json_schema' as an object."))
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": [{"name":"x","json_schema":{},"records":{}}]}"""))
      .getMessage.contains("invalid 'records'"))
    assert(intercept[IllegalArgumentException](
      cfg("""{"custom_scenarios": [{"name":"x","json_schema":{},"records":[1]}]}"""))
      .getMessage.contains("record at index 0 must be an object."))

    val ok = cfg("""{"all_slow_streams":true,"large_batch_record_count":50,
      "scenario_filter":["basic_types"],"namespace":"ns1",
      "custom_scenarios":[{"name":"c1","json_schema":{"type":"object","properties":{"a":{"type":"integer"}}},
        "records":[{"a":1}],"primary_key":[["a"]]}]}""")
    assert(ok.allSlowStreams && ok.largeBatchRecordCount == 50)
    assert(ok.scenarioFilter == Seq("basic_types") && ok.namespace.contains("ns1"))
    assert(ok.customScenarios.head.primaryKey.contains(Seq(Seq("a"))))
  }

  test("custom scenarios load from YAML and JSON files with the reference's error messages") {
    def write(name: String, content: String): String = {
      val p = java.nio.file.Files.createTempFile(name, if (name.contains("yaml")) ".yaml" else ".json")
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toString
    }
    // YAML list form
    val yamlList = write("smoke-yaml",
      """- name: custom_a
        |  json_schema:
        |    type: object
        |    properties:
        |      id: {type: integer}
        |  records:
        |    - {id: 1}
        |  primary_key: [["id"]]
        |""".stripMargin)
    val fromYaml = SmokeTest.loadCustomScenariosFile(yamlList)
    assert(fromYaml.map(_.name) == Seq("custom_a"))
    assert(fromYaml.head.primaryKey.contains(Seq(Seq("id"))))
    assert(fromYaml.head.records == Seq("""{"id":1}"""))
    // JSON dict form with a custom_scenarios key
    val jsonDict = write("smoke-json",
      """{"custom_scenarios":[{"name":"custom_b","json_schema":{"type":"object","properties":{}}}]}""")
    assert(SmokeTest.loadCustomScenariosFile(jsonDict).map(_.name) == Seq("custom_b"))
    // error surfaces
    assert(intercept[IllegalArgumentException](
      SmokeTest.loadCustomScenariosFile("/nonexistent/path.yaml"))
      .getMessage.contains("Custom scenarios file not found"))
    val scalarDoc = write("smoke-bad", "\"just a string\"")
    assert(intercept[IllegalArgumentException](
      SmokeTest.loadCustomScenariosFile(scalarDoc))
      .getMessage.contains("must contain a list of scenarios"))
  }

  test("namespace generator: zz_deleteme prefix + timestamp + suffix") {
    val ns = SmokeTest.generateNamespace(
      now = java.time.Instant.parse("2026-03-18T22:56:00Z"))
    assert(ns == "zz_deleteme_20260318_2256_smoke_test")
    assert(SmokeTest.generateNamespace(Some("mytest"),
      java.time.Instant.parse("2026-03-18T22:56:00Z")).endsWith("_mytest"))
  }

  // ---- the gauntlet: all scenarios through the production sync ------

  private val Ns = "zz_spec_smoke"
  private lazy val result = {
    SparkCache.fresh(spark, Ns) // physically clear any prior JVM's leftovers
    SmokeTest.run(spark, scenarios = "all", reuseNamespace = Some(Ns))
  }
  private lazy val cache = { result; val c = new SparkCache(spark, Ns); c.reopen(); c }

  private def rows(stream: String): Seq[Row] =
    cache.table(stream).drop("_airbyte_raw_id", "_airbyte_extracted_at", "_airbyte_meta")
      .collect().toSeq

  test("smoke run succeeds: preflight + 22 scenarios synced, readback complete") {
    assert(result.success, s"smoke run failed: ${result.error}")
    assert(result.preflightPassed.contains(true))
    assert(result.recordsDelivered == 1059L) // 59 inline + 1000 generated
    assert(result.tablesNotFound.isEmpty)
    assert(result.tableStatistics.size == 22)
    assert(cache.tableExists(SmokeTest.PreflightStreamName))
    assert(cache.table(SmokeTest.PreflightStreamName).count() == 3)
  }

  test("basic_types: values and Spark types match the declared conversion") {
    val df = cache.table("basic_types")
    assert(df.schema("amount").dataType == DecimalType(38, 9))
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("is_active").dataType == BooleanType)
    val byId = rows("basic_types").map(r => r.getLong(0) -> r).toMap
    assert(byId(1).getString(1) == "Alice")
    assert(byId(1).getDecimal(2) == new java.math.BigDecimal("100.500000000"))
    assert(byId(2).getDecimal(2) == new java.math.BigDecimal("0.000000000"))
    assert(byId(3).getString(1) == "" && byId(3).getBoolean(3))
    assert(byId(3).getDecimal(2) == new java.math.BigDecimal("-99.990000000"))
  }

  test("timestamp and time types: dates, tz/ntz timestamps, time-as-ISO-text") {
    val ts = cache.table("timestamp_types")
    assert(ts.schema("created_date").dataType == DateType)
    assert(ts.schema("updated_at").dataType == TimestampType)
    val r1 = ts.filter($"id" === 1).select("created_date", "updated_at", "epoch_seconds").head()
    assert(r1.getDate(0).toString == "2024-01-15")
    assert(r1.getTimestamp(1).toInstant == java.time.Instant.parse("2024-01-15T10:30:00Z"))
    assert(r1.getLong(2) == 1705312200L)
    val r3 = ts.filter($"id" === 3).select("updated_at").head()
    assert(r3.getTimestamp(0).toInstant ==
      java.time.Instant.parse("2099-12-31T23:59:59.999999Z"))

    val tt = cache.table("time_types")
    assert(tt.schema("time_no_tz").dataType == StringType) // Spark has no TIME
    assert(tt.schema("timestamp_no_tz").dataType == TimestampNTZType)
    val t3 = tt.filter($"id" === 3)
      .select("time_no_tz", "time_with_tz", "timestamp_no_tz").head()
    assert(t3.getString(0) == "23:59:59.999999")
    assert(t3.getString(1) == "23:59:59.999999-08:00")
    assert(t3.getAs[java.time.LocalDateTime](2) ==
      java.time.LocalDateTime.parse("2099-12-31T23:59:59.999999"))
  }

  test("column and stream naming: normalization maps every edge case to a distinct snake_case name") {
    val cols = cache.table("column_naming_edge_cases").columns.toSeq
    assert(cols.take(11) == Seq("id", "camelcasecolumn", "allcaps",
      "snake_case_column", "column_with_dashes", "column_with_dots",
      "column_with_spaces", "select", "from", "order", "group"))
    val r = rows("column_naming_edge_cases").head
    assert(r.getString(4) == "dashes" && r.getString(5) == "dots" &&
      r.getString(6) == "spaces" && r.getString(7) == "reserved_select")
    // CamelCase stream lands under its normalized table name
    assert(cache.tableExists("camelcasestreamname"))
    assert(rows("camelcasestreamname").head.getString(1) == "camel_case_stream_test")
    // very long names survive untruncated (Spark has no 63-char limit)
    val longCols = cache.table("long_column_names").columns
    assert(longCols.exists(_.length > 120))
    assert(rows("long_column_names").head.getString(1) == "long_col_1")
  }

  test("null handling and sparse records: missing fields null-fill, present falses/zeros survive") {
    val nh = rows("null_handling").map(r => r.getLong(0) -> r).toMap
    assert((1 to 6).forall(i => nh(2).isNullAt(i)), "all-null record")
    assert(nh(3).getString(1) == "" && nh(3).getLong(2) == 0L &&
      !nh(3).getBoolean(4) && nh(3).getString(5) == "{}")
    assert(nh.values.forall(_.isNullAt(6)), "always_null column")
    val sp = rows("sparse_records").map(r => r.getLong(0) -> r).toMap
    assert(sp.size == 7)
    assert((1 to 5).forall(i => sp(7).isNullAt(i)), "id-only record nulls the rest")
    assert(sp(1).getString(1) == "only_a" && sp(1).isNullAt(2))
    assert(sp(6).getBoolean(4) == false && sp(6).getLong(2) == 99L)
    // readback stats see the same nulls
    val st = result.tableStatistics("null_handling")
    assert(st.columns.find(_.name == "always_null").get.nullCount == 3)
    assert(st.columns.find(_.name == "nullable_integer").get.nonNullCount == 2)
  }

  test("nested objects, unions, and mixed arrays land as canonical JSON text; typed arrays stay typed") {
    val nested = cache.table("nested_json_objects")
    assert(nested.schema("metadata").dataType == StringType)
    assert(nested.schema("items_array").dataType == ArrayType(StringType))
    val n1 = nested.filter($"id" === 1).select("metadata", "nested_deep", "items_array").head()
    assert(n1.getString(0) == """{"source":"api","tags":["a","b","c"]}""")
    assert(n1.getString(1) == """{"level1":{"level2":{"value":"deep"}}}""")
    assert(n1.getSeq[String](2) == Seq("""{"sku":"ABC","qty":10}"""))

    val u = rows("union_types").map(r => r.getLong(0) -> r).toMap
    assert(u(1).getString(1) == "hello" && u(2).getString(1) == "42")
    assert(u(1).getString(3) == """{"key":"value"}""" &&
      u(2).getString(3) == "just_a_string" && u(3).getString(3) == "{}")
    assert(u(2).isNullAt(2) && u(3).getString(2) == "0.0")

    val a = cache.table("array_of_primitives")
    assert(a.schema("integer_array").dataType == ArrayType(LongType))
    assert(a.schema("mixed_array").dataType == StringType)
    val a2 = a.filter($"id" === 2).select("integer_array", "mixed_array").head()
    assert(a2.getSeq[Long](0) == Seq(0L, -1L, 999999999L))
    assert(a2.getString(1) == """[{"nested":"object"},[1,2]]""")
    val a1 = a.filter($"id" === 1).select("mixed_array", "empty_typed_array").head()
    assert(a1.getString(0) == """["text",42,true,null,3.141592653589793]""")
    assert(a1.getSeq[java.math.BigDecimal](1).isEmpty)
  }

  test("unicode, escapes, and large strings survive byte-exact") {
    val u = rows("unicode_and_special_strings").map(r => r.getLong(0) -> r).toMap
    assert(u(1).getString(2) == "line1\nline2\ttab")
    assert(u(2).getString(1) == "Café naïve résumé" && u(2).getString(2) == "quote\"inside")
    assert(u(3).getString(1) == "你好世界" && u(3).getString(2) == "back\\slash")
    assert(u(4).getString(1) == "АБВГ" && u(4).getString(2) == "")

    val ls = cache.table("large_string_values")
      .select($"id", org.apache.spark.sql.functions.length($"short_value"),
        org.apache.spark.sql.functions.length($"medium_value"),
        org.apache.spark.sql.functions.length($"large_value"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(ls(1) == ((1000, 10000, 100000)))
    assert(ls(2)._1 == "Hello, World!".length)
  }

  test("numeric boundaries: bigint extremes exact, out-of-DECIMAL(38,9)-range floats null the FIELD only") {
    val sn = rows("special_number_values").map(r => r.getLong(0) -> r).toMap
    assert(sn.size == 7, "no record may be lost to a field overflow")
    assert(sn(4).getLong(2) == Long.MaxValue && sn(5).getLong(2) == Long.MinValue)
    assert(sn(6).getLong(2) == Int.MaxValue && sn(7).getLong(2) == Int.MinValue)
    // 1.79e308 exceeds DECIMAL(38,9) (the reference's declared 'number'
    // type, types.py:18) — the field nulls, the record survives
    assert(sn(1).isNullAt(1) && sn(3).isNullAt(1))
    assert(sn(1).getLong(2) == 1L, "sibling fields keep their values")
    // 5e-324 underflows scale 9 to zero rather than nulling
    assert(sn(2).getDecimal(1) == new java.math.BigDecimal("0.000000000"))
    val ld = rows("large_decimals_and_numbers").map(r => r.getLong(0) -> r).toMap
    assert(ld(1).getLong(1) == 9999999999999999L)
    assert(ld(1).getDecimal(2) == new java.math.BigDecimal("3.141592654")) // HALF_UP @ scale 9
    assert(ld(3).getDecimal(2) == new java.math.BigDecimal("99999999.999999990"))
  }

  test("merge semantics: duplicate PKs keep the latest scripted record; no-PK streams append") {
    val dup = rows("duplicate_primary_keys")
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(dup == Map(1L -> "third", 2L -> "second", 3L -> "first"))
    // schema_with_no_primary_key: AUTO resolves to replace/append — all
    // 3 records (including the exact duplicate) land
    assert(rows("schema_with_no_primary_key").size == 3)
  }

  test("empty, single, wide, and large-batch streams") {
    assert(cache.tableExists("empty_stream"))
    assert(cache.table("empty_stream").count() == 0, "empty stream still creates its table")
    assert(rows("single_record_stream").size == 1)
    assert(cache.table("wide_table_50_columns").columns.length == 50 + 3) // + metadata
    val w = rows("wide_table_50_columns").map(r => r.getLong(0) -> r).toMap
    assert(w(1).getString(1) == "val_1" && w(1).getString(49) == "val_49")
    assert((1 to 49).forall(w(2).isNullAt))

    val lb = cache.table("large_batch_stream")
    assert(lb.count() == 1000)
    val cats = lb.groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats.values.toSet == Set(200L) && cats.keySet.size == 5)
    val r500 = lb.filter($"id" === 500).head()
    assert(r500.getString(1) == "record_000500")
    assert(r500.getDecimal(2) == new java.math.BigDecimal("550.000000000"))
  }

  test("large_batch record generation is distributed, not a driver list") {
    // a cranked-up count builds through spark.range: the record dataset's
    // plan must contain a Range leaf (and no LocalRelation of that size)
    val src = new SmokeTestSource(sources.SmokeTestConfig(
      allFastStreams = false, scenarioFilter = Seq("large_batch_stream"),
      largeBatchRecordCount = 100000))
    val ds = SmokeTestScenarios.recordJsonl(spark,
      src.scenarios.find(_.name == "large_batch_stream").get)
    val plan = ds.queryExecution.optimizedPlan.toString
    assert(plan.contains("Range"), s"expected Range-backed generator, got:\n$plan")
    assert(ds.count() == 100000L)
  }
}
