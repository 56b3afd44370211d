package graft

import java.util.Locale

import org.apache.spark.sql.types._

import graft.protocol.{ConfiguredCatalog, ConfiguredStream}

/**
 * Locale-independence of identifier matching. Under `Locale("tr")`,
 * default-locale `"I".toLowerCase` yields dotless 'ı' — so any bare
 * `toLowerCase` comparing stream/column names silently stops matching
 * uppercase-I identifiers. Every identifier-matching site must use
 * `Locale.ROOT` (or NameNormalizer's ASCII arithmetic); this suite
 * pins the behavior AND greps the source tree so a regression cannot
 * land silently.
 */
class LocaleSafetySpec extends SparkTestBase {

  private def inTurkishLocale[T](body: => T): T = {
    val prior = Locale.getDefault
    try { Locale.setDefault(new Locale("tr", "TR")); body }
    finally Locale.setDefault(prior)
  }

  test("stream lookup matches an uppercase-I name under Locale(tr)") {
    inTurkishLocale {
      val catalog = ConfiguredCatalog(Seq(ConfiguredStream("INVOICES",
        StructType(Seq(StructField("ID", LongType))), primaryKeys = Seq("ID"))))
      // Protocol byName map lowercases both sides — must hit, not throw
      assert(catalog("invoices").name == "INVOICES")
      assert(catalog("INVOICES").name == "INVOICES")
    }
  }

  test("schema evolution matches an evolved dotted-I column under Locale(tr)") {
    inTurkishLocale {
      import graft.cache.SparkCache
      val cache = SparkCache.fresh(spark, "graft_test_trlocale")
      try {
        val catalog = ConfiguredCatalog(Seq(ConfiguredStream("ITEMS",
          StructType(Seq(StructField("ITEM_ID", LongType))))))
        val batch1 = spark.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](
            org.apache.spark.sql.Row(1L)),
          StructType(Seq(StructField("ITEM_ID", LongType))))
        cache.writeStream("ITEMS", batch1, catalog,
          graft.protocol.WriteStrategy.Append)
        // second batch re-sends ITEM_ID plus a new column: ITEM_ID must
        // MATCH the existing column (no duplicate add), INVOICE_ID must
        // be detected as missing and added
        val batch2 = spark.createDataFrame(
          java.util.List.of[org.apache.spark.sql.Row](
            org.apache.spark.sql.Row(2L, 7L)),
          StructType(Seq(StructField("ITEM_ID", LongType),
            StructField("INVOICE_ID", LongType))))
        cache.addMissingColumns("ITEMS", batch2.schema)
        val cols = cache.table("ITEMS").schema.fieldNames.toSeq
        assert(cols.count(_.equalsIgnoreCase("item_id")) == 1,
          s"ITEM_ID must not duplicate: $cols")
        assert(cols.exists(_.equalsIgnoreCase("invoice_id")),
          s"INVOICE_ID must be added: $cols")
      } finally cache.dropAll()
    }
  }

  test("grep gate: no bare toLowerCase/toUpperCase in src/main") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root), s"run from repo root: $root")
    val bare = """\.to(Lower|Upper)Case(?!\(java\.util\.Locale|\(Locale)""".r
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        if (bare.findFirstIn(text).isDefined) Some(p.toString) else None
      }.toSeq
    assert(offenders.isEmpty,
      s"bare locale-dependent case conversion in: ${offenders.mkString(", ")}")
  }
}
