package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension hook registering graft's custom expressions as SQL
 * functions, the idiomatic injection point for engine extensions:
 *
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
 *
 * (or `.withExtensions(new GraftSparkExtensions)`). After that, SQL users
 * get `uuid7()`, `simhash(text)`, `shingle_minhash(text)` directly in
 * `spark.sql(...)` — same codegen/eval path as the Column API.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("uuid7"),
      new ExpressionInfo(classOf[Uuid7Expression].getName, "uuid7"),
      (_: Seq[Expression]) => Uuid7Expression()))

    ext.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimhashExpression].getName, "simhash"),
      (args: Seq[Expression]) => SimhashExpression(args.head)))

    ext.injectFunction((
      FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinhashExpression].getName, "shingle_minhash"),
      (args: Seq[Expression]) => ShingleMinhashExpression(args.head)))

    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProductExpression(args.head, args(1))))

    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[L2NormExpression].getName, "vec_norm"),
      (args: Seq[Expression]) => L2NormExpression(args.head)))

    ext.injectFunction((
      FunctionIdentifier("top_word_count"),
      new ExpressionInfo(classOf[TopWordCountExpression].getName, "top_word_count"),
      (args: Seq[Expression]) => TopWordCountExpression(args.head)))

    // cdc_chunks(text) — q212's word-granularity content-defined
    // chunk digests with the frozen (w=4, d=32) boundary parameters
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpression].getName, "cdc_chunks"),
      (args: Seq[Expression]) => CdcChunksExpression(args.head, 4, 32)))
  }
}
