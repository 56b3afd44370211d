package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

/** DataSourceV2 protocol source: declared schema, null-fill/prune,
  * pruned JSON parsing, per-file partitions, gzip spill files. */
class V2SourceSpec extends SparkTestBase {

  private val fmt = "graft.sources.v2.ProtocolDataSource"

  private val catalogJson =
    """{"streams":[
      |  {"name":"Users","json_schema":{"properties":{
      |     "id":{"type":"integer"},"name":{"type":"string"},
      |     "score":{"type":"number"},"active":{"type":"boolean"},
      |     "tags":{"type":"array"}}},
      |   "source_defined_primary_key":[["id"]]}
      |]}""".stripMargin

  private def rec(stream: String, data: String, at: Long) =
    s"""{"type":"RECORD","record":{"stream":"$stream","data":$data,"emitted_at":$at}}"""

  private def writeLines(path: String, lines: Seq[String], gzip: Boolean = false): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    if (gzip) {
      val out = new GZIPOutputStream(Files.newOutputStream(p))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    } else Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
  }

  test("declared schema drives projection: null-fill, prune, types, metadata ts") {
    val dir = Files.createTempDirectory("graft-v2").toString
    writeLines(s"$dir/b1.jsonl", Seq(
      rec("users", """{"id":1,"NAME":"ann","score":1.5,"active":true,"tags":[1,2]}""", 1700000000000L),
      rec("users", """{"id":2,"extra_col":"dropped"}""", 1700000001000L),
      rec("other", """{"id":99}""", 1700000002000L), // different stream
      """{"type":"STATE","state":{"type":"STREAM"}}""",
      "not json at all"))
    val df = spark.read.format(fmt)
      .option("catalogJson", catalogJson).option("stream", "users")
      .load(s"$dir/b1.jsonl")
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "name", "score", "active", "tags", "_airbyte_extracted_at"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    // case-insensitive field pickup (NAME → name), array → JSON text
    assert(rows(0).getAs[String]("name") == "ann")
    assert(rows(0).getAs[String]("tags") == "[1,2]")
    assert(rows(0).getAs[Boolean]("active"))
    // null-fill for missing declared fields; undeclared pruned
    assert(rows(1).isNullAt(rows(1).fieldIndex("name")))
    assert(!df.columns.contains("extra_col"))
    // extracted_at = emitted_at millis
    assert(rows(0).getAs[java.sql.Timestamp]("_airbyte_extracted_at").getTime
      == 1700000000000L)
  }

  test("one partition per file; gzip files decode; pruned read works") {
    val dir = Files.createTempDirectory("graft-v2").toString
    writeLines(s"$dir/p1.jsonl", (1 to 5).map(i => rec("users", s"""{"id":$i}""", i)))
    writeLines(s"$dir/p2.jsonl.gz", (6 to 9).map(i => rec("users", s"""{"id":$i}""", i)), gzip = true)
    val df = spark.read.format(fmt)
      .option("catalogJson", catalogJson).option("stream", "users")
      .load(dir)
    assert(df.rdd.getNumPartitions == 2) // one per staged file
    assert(df.count() == 9)
    // column pruning pushes into the reader (scan reads only `id`)
    val ids = df.select(col("id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
    assert(ids.collect().sorted.toSeq == (1L to 9L))
    val scanLine = ids.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft protocol scan")).getOrElse("")
    assert(scanLine.contains("readSchema=id"), s"not pruned: $scanLine")
  }

  test("comparison filters push into the reader (cursor-incremental shape)") {
    val dir = Files.createTempDirectory("graft-v2").toString
    writeLines(s"$dir/c1.jsonl",
      (1 to 10).map(i => rec("users", s"""{"id":$i,"name":"u$i"}""", i)) :+
        rec("users", """{"name":"no_id"}""", 11)) // null cursor → filtered
    val df = spark.read.format(fmt)
      .option("catalogJson", catalogJson).option("stream", "users")
      .load(s"$dir/c1.jsonl")
      .filter(col("id") > 7 && col("name") =!= "u9")
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(8L, 10L))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft protocol scan")).getOrElse("")
    assert(scanLine.contains("pushedFilters=[") &&
      scanLine.contains("GreaterThan(id,7)"), s"not pushed: $scanLine")
  }

  test("filter on _airbyte_extracted_at keeps rows (envelope-resolved IsNotNull)") {
    // Regression: Spark auto-infers IsNotNull(_airbyte_extracted_at) for any
    // comparison on it; the reader must resolve that against the envelope's
    // emitted_at (the column is never in the data payload), or every row is
    // silently dropped at the scan.
    val dir = Files.createTempDirectory("graft-v2").toString
    writeLines(s"$dir/e1.jsonl",
      (1 to 5).map(i => rec("users", s"""{"id":$i}""", 1700000000000L + i * 1000L)))
    val df = spark.read.format(fmt)
      .option("catalogJson", catalogJson).option("stream", "users")
      .load(s"$dir/e1.jsonl")
      .filter(col("_airbyte_extracted_at") >=
        java.sql.Timestamp.valueOf("2023-11-14 00:00:00"))
    assert(df.count() == 5, "extracted_at filter must not drop valid rows at the reader")
    // explicit IsNotNull / IsNull on the metadata column also behave
    assert(df.filter(col("_airbyte_extracted_at").isNotNull).count() == 5)
    assert(df.filter(col("_airbyte_extracted_at").isNull).count() == 0)
  }
}
