package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain
import graft.streaming.StreamingBloom

/** Codegen'd Bloom probe: bit-exact parity with the driver-side
  * StreamingBloom.mightContain (same seeds/arithmetic), no false
  * negatives through the DataFrame path, and the probe stays INSIDE
  * whole-stage codegen (the entire point of replacing the UDF). */
class BloomMightContainSpec extends SparkTestBase {

  import spark.implicits._

  private val (p, k) = (16, 3)

  private def builtOver(keys: Seq[Long]): StreamingBloom = {
    val sb = new StreamingBloom(p, k)
    sb.processBatch(spark.createDataset(keys).toDF("key"))
    sb
  }

  test("expression parity with StreamingBloom.mightContain, member and non-member") {
    val inserted = (1L to 3000L).map(_ * 2654435761L)
    val sb = builtOver(inserted)
    val bc = spark.sparkContext.broadcast(sb.wordsSnapshot)
    val probes = inserted.take(500) ++ (1L to 2000L).map(_ * 40503L + 7L)
    val got = spark.createDataset(probes).toDF("key")
      .withColumn("hit", BloomMightContain.column(col("key"), bc, p, k))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { key =>
      assert(got(key) == sb.mightContain(key),
        s"probe($key): expression ${got(key)} != driver ${sb.mightContain(key)}")
    }
  }

  test("no false negatives through the DataFrame filter") {
    val inserted = (1L to 5000L).map(_ * 1315423911L)
    val sb = builtOver(inserted)
    val bc = spark.sparkContext.broadcast(sb.wordsSnapshot)
    val kept = spark.createDataset(inserted).toDF("key")
      .filter(BloomMightContain.column(col("key"), bc, p, k))
      .count()
    assert(kept == inserted.size.toLong,
      s"dropped ${inserted.size - kept} inserted keys — false negatives")
  }

  test("interpreted eval matches codegen (null-safe)") {
    val sb = builtOver((1L to 100L).toSeq)
    val bc = spark.sparkContext.broadcast(sb.wordsSnapshot)
    val e = BloomMightContain(
      org.apache.spark.sql.GraftBridge.expression(col("key")), bc, p, k)
    // direct interpreted calls (nullSafeEval path)
    (1L to 100L).foreach { key =>
      val lit = BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(key), bc, p, k)
      assert(lit.eval(null) == sb.mightContain(key))
    }
    assert(e.dataType == org.apache.spark.sql.types.BooleanType)
  }

  test("probe inlines into whole-stage codegen (no fallback stage break)") {
    val sb = builtOver((1L to 100L).toSeq)
    val bc = spark.sparkContext.broadcast(sb.wordsSnapshot)
    val df = spark.range(0, 1000).toDF("key")
      .filter(BloomMightContain.column(col("key"), bc, p, k))
    df.collect() // force execution so the executed plan exists
    val plan = df.queryExecution.executedPlan.toString
    // the Filter carrying the probe must sit inside a WholeStageCodegen
    // span: find the filter line and assert its codegen star marker
    val lines = plan.linesIterator.toSeq
    val filterLine = lines.find(_.contains("bloom_might_contain"))
    assert(filterLine.isDefined, s"probe not in executed plan:\n$plan")
    assert(filterLine.get.contains("*"),
      s"probe fell out of whole-stage codegen:\n$plan")
  }

  test("non-LONG key fails analysis (ExpectsInputTypes), INT coerces") {
    val sb = builtOver(Seq(1L, 2L))
    val bc = spark.sparkContext.broadcast(sb.wordsSnapshot)
    // an un-castable child (array) is rejected at ANALYSIS — the old
    // bare UnaryExpression ClassCast'd at runtime instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(0, 3).toDF("key")
        .select(BloomMightContain.column(array(lit(1.0)), bc, p, k))
        .collect()
    }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("type"))
    // an INT child is implicitly cast to LONG and probes correctly
    val ok = spark.range(0, 3).toDF("key")
      .select(BloomMightContain.column(
        col("key").cast(org.apache.spark.sql.types.IntegerType), bc, p, k).as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ok == Seq(false, true, true).map(identity))
  }
}
