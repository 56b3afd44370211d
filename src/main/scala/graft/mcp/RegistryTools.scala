package graft.mcp

import graft.sources.Registry
import graft.sources.Registry.{ApiDocsUrl, ConnectorMetadata, ConnectorVersionInfo, InstallType}

/**
 * MCP registry tool set (reference `airbyte/mcp/registry.py`): connector
 * discovery over a registry DOCUMENT the caller supplies (the published
 * `oss_registry.json` shape) — the zero-egress analog of the reference's
 * HTTP registry fetches, completing the Q6 tool surface next to
 * [[LocalTools]] and [[CloudTools]]. Filter semantics mirror
 * `list_connectors` (keyword substring, source/destination type,
 * install-type union); `get_connector_info` returns the same fields
 * (metadata, docs URL, config spec when the document carries one, the
 * manifest URL template from `registry.py:43`); `get_api_docs_urls`
 * assembles the registry's `documentationUrl` + external API docs the
 * way `registry.py:460-487` does.
 */
object RegistryTools {

  /** `list_connectors` (registry.py:48): all filters optional, composed
    * with AND; install types compose with OR (a connector matches if it
    * supports ANY of the requested types). */
  def listConnectors(
      registry: Seq[ConnectorMetadata],
      keywordFilter: Option[String] = None,
      connectorTypeFilter: Option[String] = None,
      installTypes: Seq[InstallType.Value] = Seq.empty): Seq[String] = {
    require(connectorTypeFilter.forall(t => t == "source" || t == "destination"),
      s"connector type must be 'source' or 'destination', got $connectorTypeFilter")
    registry
      .filter(m => keywordFilter.forall(k =>
        m.canonicalName.contains(k.toLowerCase(java.util.Locale.ROOT))))
      .filter(m => connectorTypeFilter.forall(t => m.canonicalName.startsWith(t + "-")))
      .filter(m => installTypes.isEmpty || installTypes.exists(m.installTypes.contains))
      .map(_.canonicalName).sorted
  }

  private val ManifestUrlTemplate =
    "https://connectors.airbyte.com/files/metadata/airbyte/%s/%s/manifest.yaml"

  /** `get_connector_info` (registry.py:145): None when unknown (the
    * reference returns the literal "Connector not found."). */
  def getConnectorInfo(registry: Seq[ConnectorMetadata],
      name: String): Option[Map[String, String]] =
    Registry.connectorMetadata(registry, name).map { m =>
      Map(
        "connector_name" -> m.canonicalName,
        "docker_repository" -> m.dockerRepository,
        "docker_image_tag" -> m.dockerImageTag,
        "language" -> m.language.getOrElse(""),
        "support_level" -> m.supportLevel.getOrElse(""),
        "install_types" -> m.installTypes.toSeq.map(_.toString.toLowerCase(java.util.Locale.ROOT)).sorted.mkString(","),
        "documentation_url" -> m.documentationUrl.getOrElse(""),
        "config_spec_jsonschema" -> m.specJson.getOrElse(""),
        "manifest_url" -> ManifestUrlTemplate.format(m.canonicalName, "latest"))
    }

  /** `get_api_docs_urls` (registry.py:204 → registry.py:460-487):
    * the Airbyte docs page first, then upstream API docs. None when
    * the connector is unknown. */
  def getApiDocsUrls(registry: Seq[ConnectorMetadata],
      name: String): Option[Seq[ApiDocsUrl]] =
    Registry.connectorMetadata(registry, name).map { m =>
      m.documentationUrl.map(u =>
        ApiDocsUrl("Airbyte Documentation", u, "other", requiresLogin = false)).toSeq ++
        m.externalDocs
    }

  /** `get_connector_version_history` (mcp/registry.py:227-291 →
    * registry.py:544-618): None when the connector is not in the
    * registry (the reference returns "Connector not found."); otherwise
    * the parsed changelog rows, most recent first, with the release
    * dates of the newest `numVersionsToValidate` entries overridden by
    * the registry document's release-candidate commit dates when
    * present. `changelogHtml` is caller-supplied (zero-egress analog of
    * the docs.airbyte.com fetch — an unfetchable changelog maps to an
    * empty string and yields the reference's empty-list behavior).
    * `limit` mirrors the deprecated MCP parameter: positive values
    * truncate to the most recent N. */
  def getConnectorVersionHistory(
      registry: Seq[ConnectorMetadata],
      name: String,
      changelogHtml: String,
      numVersionsToValidate: Int = 5,
      limit: Option[Int] = None): Option[Seq[ConnectorVersionInfo]] =
    Registry.connectorMetadata(registry, name).map { _ =>
      val parsed = Registry.parseChangelogHtml(changelogHtml, name)
      val validated = parsed.zipWithIndex.map { case (v, i) =>
        if (i < numVersionsToValidate)
          Registry.registryVersionDate(registry, name, v.version)
            .map(d => v.copy(releaseDate = Some(d))).getOrElse(v)
        else v
      }
      limit.filter(_ > 0).map(validated.take).getOrElse(validated)
    }
}
