package graft.cloud

import org.apache.spark.sql.SparkSession

import scala.collection.immutable.ListMap

import graft.cache.SparkCache
import graft.errors.GraftInputError
import graft.sources.Secrets

/**
 * Cache ↔ destination config equivalence (reference
 * `airbyte/caches/_utils/_cache_to_dest.py:37-133` and
 * `_dest_to_cache.py:53-277`): a cache and the destination that would
 * write to it are two views of one storage target, so a cache can be
 * deployed AS a destination and a destination's config can be opened
 * AS a cache for reading synced data back.
 *
 * The reference maintains per-backend conversion maps (duckdb /
 * motherduck / postgres / snowflake / bigquery); this engine's one
 * Spark-native cache collapses those to a single `spark` destination
 * type whose config is the cache's coordinates (database, table
 * prefix, optional warehouse location). The dispatch shape — type map,
 * loud unsupported-type error listing the supported set, optional
 * schema override forcing re-resolution — is preserved, so additional
 * backends slot in as new map entries.
 */
object CacheDestinationBridge {

  /** This engine's destination type identifier. */
  val SparkDestinationType = "spark"

  /** `get_supported_destination_types` (_dest_to_cache.py:48-50). */
  def supportedDestinationTypes: Set[String] = Set(SparkDestinationType)

  private def mapper = Secrets.mapper

  /**
   * `cache_to_destination_configuration` (_cache_to_dest.py:37-63): the
   * destination config JSON describing the cache's storage target.
   * Includes `destinationType` so the inverse can dispatch.
   */
  def destinationConfigFor(cache: SparkCache): String = {
    val node = mapper.createObjectNode()
    node.put("destinationType", SparkDestinationType)
    node.put("database", cache.database)
    node.put("schema", cache.database) // reference field name parity
    if (cache.tablePrefix.nonEmpty) node.put("table_prefix", cache.tablePrefix)
    cache.location.foreach(node.put("location", _))
    mapper.writeValueAsString(node)
  }

  /**
   * `destination_to_cache` (_dest_to_cache.py:53-101): open the cache a
   * destination config points at. `destinationType` may appear under
   * either key casing the reference tolerates (`destinationType` /
   * `DESTINATION_TYPE`); an unsupported type raises with the supported
   * list. `schemaName` overrides the target schema (here: database) —
   * the reference forces engine re-creation after the override; a
   * [[SparkCache]] resolves its database at construction, so the
   * override simply constructs against the new database.
   */
  def destinationToCache(
      spark: SparkSession,
      destinationConfigJson: String,
      schemaName: Option[String] = None): SparkCache = {
    val node = mapper.readTree(destinationConfigJson)
    val declared = Option(node.get("destinationType"))
      .orElse(Option(node.get("DESTINATION_TYPE")))
      .map(_.asText())
      .getOrElse(throw new GraftInputError(
        "Missing 'destinationType' in destination config.",
        context = ListMap("keys" -> scala.jdk.CollectionConverters
          .IteratorHasAsScala(node.fieldNames()).asScala.toList.mkString(","))))
    if (!supportedDestinationTypes.contains(declared))
      throw new GraftInputError(
        s"Cannot convert destination to a cache configuration. Destination " +
          s"type $declared not supported.",
        guidance = Some(s"Supported cache types: " +
          s"${supportedDestinationTypes.toList.sorted}"),
        context = ListMap("destination_type" -> declared))
    val database = schemaName.orElse(
      Option(node.get("database")).map(_.asText())
        .orElse(Option(node.get("schema")).map(_.asText())))
      .getOrElse(throw new GraftInputError(
        "destination config needs a 'database' (or 'schema') field",
        context = ListMap("destination_type" -> declared)))
    new SparkCache(spark,
      database = database,
      tablePrefix = Option(node.get("table_prefix")).map(_.asText()).getOrElse(""),
      location = Option(node.get("location")).map(_.asText()))
  }
}
