package graft.cloud

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * Connection artifact format conversion — the reference's
 * `airbyte/cloud/_connection_state.py` and `_connection_catalog.py`:
 * the Config API stores connection state and configured catalogs in
 * camelCase ("raw") form; connector CLI flags want the Airbyte-protocol
 * snake_case form. Conversion is SHALLOW by design — the opaque state
 * blobs and JSON schemas inside are preserved byte-for-byte; only the
 * envelope keys translate.
 */
object ConnectionArtifacts {

  private val mapper = new ObjectMapper()
  private def parse(json: String): JsonNode = mapper.readTree(json)

  /** Shallow camelCase → snake_case on an object's top-level keys. */
  private def camelToSnake(n: JsonNode): ObjectNode = {
    val out = mapper.createObjectNode()
    n.properties().asScala.foreach { e =>
      out.set[JsonNode](
        e.getKey.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase(java.util.Locale.ROOT),
        e.getValue)
    }
    out
  }

  /** Shallow snake_case → camelCase on an object's top-level keys. */
  private def snakeToCamel(n: JsonNode): ObjectNode = {
    val out = mapper.createObjectNode()
    n.properties().asScala.foreach { e =>
      val parts = e.getKey.split('_')
      val key = parts.head + parts.tail.map(_.capitalize).mkString
      out.set[JsonNode](key, e.getValue)
    }
    out
  }

  // ---- state (reference `_connection_state.py`) ---------------------

  private val ProtocolStateTypes = Set("STREAM", "GLOBAL", "LEGACY")

  /** `_is_protocol_state_format` (:225-248): an (empty or all-typed)
    * array, or a single object with protocol `type` and no `stateType`. */
  def isProtocolStateFormat(json: String): Boolean = {
    val n = parse(json)
    if (n.isArray)
      n.isEmpty || n.elements().asScala.forall(m =>
        m.isObject && Option(m.get("type")).exists(t => ProtocolStateTypes(t.asText())))
    else n.has("type") && !n.has("stateType")
  }

  private def streamEntryToApi(protocolEntry: JsonNode): ObjectNode = {
    val out = mapper.createObjectNode()
    Option(protocolEntry.get("stream_descriptor"))
      .foreach(out.set[JsonNode]("streamDescriptor", _))
    Option(protocolEntry.get("stream_state"))
      .foreach(out.set[JsonNode]("streamState", _))
    out
  }

  private def streamEntryToProtocol(apiEntry: JsonNode): ObjectNode = {
    val out = mapper.createObjectNode()
    Option(apiEntry.get("streamDescriptor"))
      .foreach(out.set[JsonNode]("stream_descriptor", _))
    Option(apiEntry.get("streamState"))
      .foreach(out.set[JsonNode]("stream_state", _))
    out
  }

  /** `_normalize_state_to_protocol` (:112-152): raw Config-API doc →
    * JSON array of protocol `AirbyteStateMessage`s (empty for not_set). */
  def normalizeStateToProtocol(rawDoc: String): String = {
    val raw = parse(rawDoc)
    val out = mapper.createArrayNode()
    raw.path("stateType").asText("not_set") match {
      case "not_set" => ()
      case "legacy" =>
        val m = mapper.createObjectNode()
        m.put("type", "LEGACY")
        m.set[JsonNode]("data",
          Option(raw.get("state")).getOrElse(mapper.createObjectNode()))
        out.add(m)
      case "global" if raw.hasNonNull("globalState") =>
        val g = raw.get("globalState")
        val body = mapper.createObjectNode()
        Option(g.get("sharedState")).foreach(body.set[JsonNode]("shared_state", _))
        val ss = mapper.createArrayNode()
        Option(g.get("streamStates")).toSeq.flatMap(_.elements().asScala)
          .foreach(e => ss.add(streamEntryToProtocol(e)))
        body.set[JsonNode]("stream_states", ss)
        val m = mapper.createObjectNode()
        m.put("type", "GLOBAL")
        m.set[JsonNode]("global", body)
        out.add(m)
      case _ => // "stream"
        Option(raw.get("streamState")).toSeq.flatMap(_.elements().asScala)
          .foreach { e =>
            val m = mapper.createObjectNode()
            m.put("type", "STREAM")
            m.set[JsonNode]("stream", streamEntryToProtocol(e))
            out.add(m)
          }
    }
    out.toString
  }

  /** `_denormalize_protocol_state_to_api` (:170-222): protocol message
    * array (or single message) → Config-API doc for `connectionId`. */
  def denormalizeProtocolStateToApi(protocolJson: String, connectionId: String): String = {
    val n = parse(protocolJson)
    val messages: Seq[JsonNode] =
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    val out = mapper.createObjectNode()
    out.put("connectionId", connectionId)
    if (messages.isEmpty) { out.put("stateType", "not_set"); return out.toString }
    val first = messages.head
    first.path("type").asText("").toUpperCase(java.util.Locale.ROOT) match {
      case "LEGACY" =>
        out.put("stateType", "legacy")
        out.set[JsonNode]("state",
          Option(first.get("data")).getOrElse(mapper.createObjectNode()))
      case "GLOBAL" =>
        out.put("stateType", "global")
        val body = first.path("global")
        val g = mapper.createObjectNode()
        g.set[JsonNode]("sharedState",
          Option(body.get("shared_state")).getOrElse(mapper.nullNode()))
        val ss = mapper.createArrayNode()
        Option(body.get("stream_states")).toSeq.flatMap(_.elements().asScala)
          .foreach(e => ss.add(streamEntryToApi(e)))
        g.set[JsonNode]("streamStates", ss)
        out.set[JsonNode]("globalState", g)
      case _ => // STREAM messages (one entry each)
        out.put("stateType", "stream")
        val ss = mapper.createArrayNode()
        messages.foreach(m =>
          ss.add(streamEntryToApi(m.path("stream"))))
        out.set[JsonNode]("streamState", ss)
    }
    out.toString
  }

  // ---- catalog (reference `_connection_catalog.py`) -----------------

  /** `_is_protocol_catalog_format` (:83-98): protocol entries carry
    * `sync_mode` at top level; API entries nest it under `config`. */
  def isProtocolCatalogFormat(json: String): Boolean = {
    val streams = parse(json).path("streams")
    streams.isArray && !streams.isEmpty && {
      val first = streams.get(0)
      first.has("sync_mode") || first.has("destination_sync_mode")
    }
  }

  /** `_normalize_catalog_to_protocol` (:20-50): camelCase `syncCatalog`
    * → protocol `ConfiguredAirbyteCatalog` (config block flattened). */
  def normalizeCatalogToProtocol(syncCatalogJson: String): String = {
    val out = mapper.createObjectNode()
    val streams = mapper.createArrayNode()
    parse(syncCatalogJson).path("streams").elements().asScala.foreach { sc =>
      val entry = mapper.createObjectNode()
      entry.set[JsonNode]("stream", camelToSnake(sc.path("stream")))
      camelToSnake(sc.path("config")).properties().asScala
        .foreach(e => entry.set[JsonNode](e.getKey, e.getValue))
      streams.add(entry)
    }
    out.set[JsonNode]("streams", streams)
    out.toString
  }

  /** `_denormalize_catalog_to_api` (:53-80): protocol catalog →
    * camelCase `syncCatalog` with config nested back. */
  def denormalizeCatalogToApi(configuredCatalogJson: String): String = {
    val out = mapper.createObjectNode()
    val streams = mapper.createArrayNode()
    parse(configuredCatalogJson).path("streams").elements().asScala.foreach { e =>
      val apiEntry = mapper.createObjectNode()
      apiEntry.set[JsonNode]("stream", snakeToCamel(e.path("stream")))
      // everything except "stream" is a config field — nest it back
      val rest = mapper.createObjectNode()
      e.properties().asScala.filterNot(_.getKey == "stream")
        .foreach(p => rest.set[JsonNode](p.getKey, p.getValue))
      apiEntry.set[JsonNode]("config", snakeToCamel(rest))
      streams.add(apiEntry)
    }
    out.set[JsonNode]("streams", streams)
    out.toString
  }

  /** Stream names selected by a catalog in EITHER format (the piece the
    * local engine acts on when a catalog artifact is imported). */
  def selectedStreamNames(catalogJson: String): Seq[String] = {
    val streams = parse(catalogJson).path("streams")
    streams.elements().asScala.flatMap { e =>
      val selected = // protocol entries are implicitly selected
        if (e.has("config")) e.path("config").path("selected").asBoolean(true)
        else true
      if (selected) Option(e.path("stream").get("name")).map(_.asText())
      else None
    }.toSeq
  }
}
