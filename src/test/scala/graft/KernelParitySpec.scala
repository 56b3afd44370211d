package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextHashFunctions

/**
 * Pins the round-13 compiled text kernels to their declarative duals
 * on adversarial random texts — the parity the q234/q237 oracles
 * assert only on the synthetic corpus. Edge cases the generator
 * forces: empty text, leading/trailing/double spaces (split keeps
 * empty tokens), vowel-free tokens (syllable floor 1), punctuation
 * runs, single-token texts shorter than the widest n-gram.
 */
class KernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("xyz", "rhythm", "a", "Y.!?", "...", "AEIOU", "bcdfg", ""),
    Gen.stringOfN(5, Gen.oneOf('a', 'b', '.', '!', '?', 'e', 'y', 'Z')))
  private val text = Gen.choose(0, 9)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    .flatMap(t => Gen.oneOf(t, " " + t, t + " ", t.replace(" ", "  ")))

  private def samples(n: Int): Seq[String] =
    (0 until n).map(i => text.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("MultiNgramsExpression equals the declarative slice/concat_ws form") {
    val df = samples(200).toDF("text")
    val toks = split(col("text"), " ")
    def declGrams(n: Int) = {
      val arr = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType)))
      transform(arr, g => struct(lit(n).as("n"), g.as("g")))
    }
    val rows = df.select(
      TextHashFunctions.multiNgrams(col("text"), 3).as("kern"),
      flatten(array(declGrams(1), declGrams(2), declGrams(3))).as("decl"))
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getInt(0), x.getString(1))).sorted
      val d = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getInt(0), x.getString(1))).sorted
      assert(k == d)
    }
  }

  test("CodeSwitchExpression equals the declarative window/langId form") {
    import graft.operators.TextAnalysis
    import graft.queries.LlmQueries.Markers
    // marker-dense generator so windows actually flip languages
    val markerWord = Gen.oneOf(Markers.flatMap(_._2) ++ Seq("noise", "zz", ""))
    val mixedText = Gen.choose(0, 90)
      .flatMap(n => Gen.listOfN(n, markerWord).map(_.mkString(" ")))
    val texts = (0 until 200).map(i =>
      mixedText.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    val df = texts.toDF("text")
    val W = 20
    val toks = split(col("text"), " ")
    val nWin = expr(s"(size(split(text, ' ')) + ${W - 1}) div $W")
    val windows = transform(sequence(lit(0L), nWin - lit(1L)),
      i => concat_ws(" ", slice(toks, (i * W + 1).cast(IntegerType), lit(W))))
    val langs = filter(
      transform(windows, w => TextAnalysis.langId(w, Markers)),
      l => l =!= "und")
    val nl = size(langs)
    val declSw = when(nl >= 2,
      aggregate(
        zip_with(slice(langs, lit(1), nl - 1), slice(langs, lit(2), nl - 1),
          (a, b) => when(a =!= b, 1L).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)).otherwise(lit(0L))
    val k = graft.functions.TextHashFunctions.codeSwitchProfile(col("text"), W, Markers)
    val bad = df.select(col("text"),
      k.getField("n_windows").as("kw"), size(windows).cast("long").as("dw"),
      k.getField("n_lang_windows").as("kl"), nl.cast("long").as("dl"),
      k.getField("mixed").as("km"), (size(array_distinct(langs)) >= 2).as("dm"),
      k.getField("switches").as("ks"), declSw.as("ds"))
      .filter(col("kw") =!= col("dw") || col("kl") =!= col("dl") ||
        col("km") =!= col("dm") || col("ks") =!= col("ds"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("ReadabilityCountsExpression follows the oracle's simple-mapping " +
      "lower() on U+0130") {
    // DuckDB (utf8proc) lower('İ') = 'i' — a 1-char SIMPLE mapping, so
    // 'İ' behaves as a vowel continuing runs; Java's FULL mapping
    // ("i" + combining dot) would break them. Expected values below are
    // hand-pinned against a live DuckDB run of the q234 oracle
    // expressions on these exact texts.
    val cases = Seq(
      ("aİa bİb İa İ", 4L, 1L, 4L),
      ("Xİ oİo! rhythm.İ", 3L, 2L, 4L))
    val df = cases.map(_._1).toDF("text")
    val r = TextHashFunctions.readabilityCounts(col("text"))
    val got = df.select(r.getField("w"), r.getField("s"), r.getField("syl"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(got.toSeq == cases.map(c => (c._2, c._3, c._4)))
  }

  test("TermCountsExpression equals the split/filter/groupBy reference") {
    val df = samples(200).toDF("text")
    val rows = df.select(col("text"),
      TextHashFunctions.termCounts(col("text")).as("tc")).collect()
    rows.foreach { r =>
      val expected = r.getString(0).split(" ", -1).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      val got = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getLong(1))).toMap
      assert(got == expected, s"text='${r.getString(0)}'")
    }
  }

  test("ShingleMinhashExpression interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.ShingleMinhashExpression
    val texts = samples(200)
    // codegen path: the DataFrame collect runs the generated projection
    val viaCodegen = texts.toDF("text")
      .select(col("text"),
        TextHashFunctions.shingleMinhash(col("text"), 9, 3).as("sm"))
      .collect()
      .map(r => r.getString(0) -> {
        val s = r.getStruct(1)
        (s.getSeq[String](0), Option(s.getSeq[String](1)).map(_.toSeq))
      }).toMap
    // interpreted path: direct Literal eval (nullSafeEval)
    texts.foreach { t =>
      val row = ShingleMinhashExpression(Literal(UTF8String.fromString(t)), 9, 3)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val sh = row.getArray(0)
      val shingles = (0 until sh.numElements())
        .map(i => sh.getUTF8String(i).toString)
      val sig = if (row.isNullAt(1)) None
        else {
          val a = row.getArray(1)
          Some((0 until a.numElements()).map(i => a.getUTF8String(i).toString))
        }
      val (csh, csig) = viaCodegen(t)
      assert(shingles == csh && sig.map(_.toSeq) == csig, s"text='$t'")
    }
  }

  test("ShingleMinhashExpression inlines into whole-stage codegen") {
    // a real scan, not a LocalRelation — ConvertToLocalRelation would
    // constant-fold the projection away before any codegen happens
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextHashFunctions.shingleMinhash(col("text"), 9, 3).as("sm"))
      .filter(size(col("sm.shingles")) >= 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("shingle_minhash"))
    assert(line.isDefined, s"kernel not in executed plan:\n$plan")
    assert(line.get.contains("*"),
      s"shingle_minhash fell out of whole-stage codegen:\n$plan")
  }

  test("the six round-15 codegen conversions: interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions._
    val texts = samples(150)
    // each kernel: direct Literal eval (interpreted nullSafeEval) vs
    // the DataFrame collect (generated projection); the two call the
    // SAME static compute, so this pins the wiring, not the math
    def arr(a: Any): Seq[String] = {
      val d = a.asInstanceOf[ArrayData]
      (0 until d.numElements()).map(i => d.getUTF8String(i).toString)
    }
    val kernels: Seq[(String, String => Expression,
        org.apache.spark.sql.Column, Any => Any)] = Seq(
      ("simhash", t => SimhashExpression(Literal(UTF8String.fromString(t))),
        TextHashFunctions.simhash(col("text")), a => a.toString),
      ("fingerprint", t => FingerprintExpression(Literal(UTF8String.fromString(t)), 8),
        TextHashFunctions.fingerprint(col("text"), 8), a => a.toString),
      ("top_word_count", t => TopWordCountExpression(Literal(UTF8String.fromString(t))),
        TextHashFunctions.topWordCount(col("text")), identity),
      ("word_entropy", t => WordEntropyExpression(Literal(UTF8String.fromString(t))),
        TextHashFunctions.wordEntropy(col("text")), identity),
      ("rolling_windows", t => RollingWindowsExpression(Literal(UTF8String.fromString(t)), 3, hashed = true),
        TextHashFunctions.rollingWindowHashes(col("text"), 3), arr),
      ("cdc_chunks", t => CdcChunksExpression(Literal(UTF8String.fromString(t)), 4, 32),
        TextHashFunctions.cdcChunks(col("text"), 4, 32), arr))
    kernels.foreach { case (name, interp, colExpr, normalize) =>
      val viaCodegen = texts.toDF("text").select(col("text"), colExpr.as("k"))
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
      texts.foreach { t =>
        val i = normalize(interp(t).eval(InternalRow.empty))
        val c = viaCodegen(t) match {
          case s: Seq[_] => s.map(_.toString)
          case other => other
        }
        assert(i == c, s"$name diverged on text='$t'")
      }
    }
  }

  test("the six round-15 codegen conversions inline into whole-stage codegen") {
    // The parity test above compares Seq.toDF paths, which
    // ConvertToLocalRelation folds with an INTERPRETED projection — a
    // codegen compile error there would silently fall back and pass.
    // This is the shingle_minhash real-scan gate extended to all six:
    // over a parquet scan the kernel's plan line must carry the
    // whole-stage '*' marker, proving the generated code compiled.
    import graft.functions.TextHashFunctions
    val kernels: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("simhash", TextHashFunctions.simhash(col("text"))),
      ("min_shingle_fingerprint", TextHashFunctions.fingerprint(col("text"), 8)),
      ("top_word_count", TextHashFunctions.topWordCount(col("text"))),
      ("word_entropy", TextHashFunctions.wordEntropy(col("text"))),
      ("rolling_window_hashes", TextHashFunctions.rollingWindowHashes(col("text"), 3)),
      ("cdc_chunks", TextHashFunctions.cdcChunks(col("text"), 4, 32)))
    kernels.foreach { case (name, kcol) =>
      val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(kcol.as("k"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains(name))
      assert(line.isDefined, s"$name not in executed plan:\n$plan")
      assert(line.get.contains("*"),
        s"$name fell out of whole-stage codegen:\n$plan")
    }
  }

  test("the round-16 conversions (lsh_signature, unicode, html_text, md5_u64) inline into whole-stage codegen") {
    import graft.functions.{HtmlFunctions, UnicodeFunctions}
    val docKernels: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("unicode_nfc", UnicodeFunctions.nfcNormalize(col("text"))),
      ("html_text", HtmlFunctions.htmlText(col("text"))),
      ("md5_u64", TextHashFunctions.md5U64(col("text"))))
    docKernels.foreach { case (name, kcol) =>
      val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(kcol.as("k"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains(name))
      assert(line.isDefined, s"$name not in executed plan:\n$plan")
      assert(line.get.contains("*"),
        s"$name fell out of whole-stage codegen:\n$plan")
    }
    val lsh = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(graft.operators.Similarity
        .lshSignature(col("embedding"), 8).as("k"))
    lsh.collect()
    val plan = lsh.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("lsh_signature"))
    assert(line.isDefined, s"lsh_signature not in executed plan:\n$plan")
    assert(line.get.contains("*"),
      s"lsh_signature fell out of whole-stage codegen:\n$plan")
  }

  test("MultiQuerySims codegen keeps the payload kernel inlined and carries the null contract") {
    import org.apache.spark.sql.GraftBridge
    import graft.functions.MultiQuerySimsExpression
    // minimal payload: one query, float anchor only + one width
    val dim = 4
    val qv = Array(1.0, 0.0, 1.0, 0.0)
    val expr = (c: org.apache.spark.sql.Column) => GraftBridge.column(
      MultiQuerySimsExpression(GraftBridge.expression(c),
        Array(7L), Array(Array(qv, qv)), Array(Array(math.sqrt(2), math.sqrt(2))),
        Array(1.0, 1.0, 1.0, 1.0), Array(8)))
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 1.0, 0.0, 0.0)),
      (2L, Seq[java.lang.Double](1.0, null, 0.0, 0.0))) // null element → null entry
    val df = rows.toDF("id", "vec")
      .repartition(2) // defeat ConvertToLocalRelation: force a real exchange scan
      .select(col("id"), expr(col("vec")).as("k"))
    val got = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L), "non-null vector must score")
    assert(got(2L), "null vector element must null the row's entry")
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("multi_query_sims"))
    assert(line.isDefined, s"kernel not in executed plan:\n$plan")
    assert(line.get.contains("*"),
      s"multi_query_sims fell out of whole-stage codegen:\n$plan")
  }

  test("ReadabilityCountsExpression equals the declarative regexp form") {
    val df = samples(200).toDF("text")
    val toks = split(col("text"), " ")
    val declW = size(toks).cast(LongType)
    val declS = greatest(lit(1L),
      length(regexp_replace(col("text"), "[^.!?]", "")).cast(LongType))
    val declSyl = aggregate(
      transform(split(lower(col("text")), " "),
        t => greatest(lit(1), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))))
          .cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val r = TextHashFunctions.readabilityCounts(col("text"))
    val bad = df.select(col("text"),
      r.getField("w").as("kw"), declW.as("dw"),
      r.getField("s").as("ks"), declS.as("ds"),
      r.getField("syl").as("ksyl"), declSyl.as("dsyl"))
      .filter(col("kw") =!= col("dw") || col("ks") =!= col("ds") ||
        col("ksyl") =!= col("dsyl"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
