package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Connector registry: the catalog that backs `get_available_connectors`
 * / `get_connector_metadata` (reference `airbyte/registry.py:262-357`;
 * registry document shape from the published `oss_registry.json`).
 *
 * Zero-egress design: the registry JSON is supplied by the caller (a
 * file path or string) instead of fetched from a URL — at cluster scale
 * the registry is distributed with the job artifacts, not downloaded
 * per executor. Lookup semantics mirror the reference: canonical names
 * are lowercase, the `source-`/`destination-` prefix is preserved, and
 * connectors are filterable by install type.
 */
object Registry {

  /** Install paths a connector supports (reference `InstallType`,
    * `registry.py:48-66`). A subprocess executor covers java/docker
    * images via their launch command; `yaml` are declarative manifests. */
  object InstallType extends Enumeration {
    val Python, Docker, Yaml, Java = Value
  }

  /** One external-API doc link from registry metadata (reference
    * `ApiDocsUrl`, `registry.py:471-487`). */
  final case class ApiDocsUrl(title: String, url: String,
      docType: String = "other", requiresLogin: Boolean = false)

  final case class ConnectorMetadata(
      name: String,
      dockerRepository: String,
      dockerImageTag: String,
      language: Option[String],
      supportLevel: Option[String],
      installTypes: Set[InstallType.Value],
      /** Airbyte docs page, from the registry's `documentationUrl`. */
      documentationUrl: Option[String] = None,
      /** Upstream API docs, from `externalDocumentationUrls`. */
      externalDocs: Seq[ApiDocsUrl] = Seq.empty,
      /** The connector's config spec JSON when the registry document
        * carries one (`spec` entry) — the zero-egress stand-in for the
        * reference's per-version registry spec fetch. */
      specJson: Option[String] = None) {
    def canonicalName: String = name.toLowerCase(java.util.Locale.ROOT)
  }

  private val mapper = new ObjectMapper()

  /** Parse a registry document: `{"sources": [...], "destinations": [...]}`.
    * Mirrors `_registry_entry_to_connector_metadata` (registry.py:152-208):
    * name from dockerRepository's last path segment, install types from
    * tags/language/remoteRegistries. */
  def fromJson(registryJson: String): Seq[ConnectorMetadata] = {
    val root = mapper.readTree(registryJson)
    Seq("sources", "destinations").flatMap { section =>
      Option(root.get(section)).toSeq.flatMap(_.elements().asScala.map { e =>
        val repo = Option(e.get("dockerRepository")).map(_.asText()).getOrElse("")
        val name = repo.split('/').lastOption.getOrElse(repo)
        val lang = Option(e.get("language")).map(_.asText())
          .orElse(Option(e.at("/tags")).filter(_.isArray)
            .flatMap(_.elements().asScala.map(_.asText())
              .find(_.startsWith("language:")).map(_.stripPrefix("language:"))))
        val pypi = e.at("/remoteRegistries/pypi/enabled").asBoolean(false)
        val types = Set.newBuilder[InstallType.Value]
        if (pypi) types += InstallType.Python
        if (repo.nonEmpty) types += InstallType.Docker
        if (lang.contains("manifest-only") || lang.contains("yaml")) types += InstallType.Yaml
        if (lang.contains("java")) types += InstallType.Java
        val extDocs = Option(e.get("externalDocumentationUrls")).toSeq
          .filter(_.isArray).flatMap(_.elements().asScala).flatMap { d =>
            for {
              title <- Option(d.get("title")).map(_.asText())
              url <- Option(d.get("url")).map(_.asText())
            } yield ApiDocsUrl(title, url,
              Option(d.get("type")).map(_.asText()).getOrElse("other"),
              Option(d.get("requiresLogin")).exists(_.asBoolean(false)))
          }
        ConnectorMetadata(
          name = name,
          dockerRepository = repo,
          dockerImageTag = Option(e.get("dockerImageTag")).map(_.asText()).getOrElse(""),
          language = lang,
          supportLevel = Option(e.get("supportLevel")).map(_.asText()),
          installTypes = types.result(),
          documentationUrl = Option(e.get("documentationUrl")).map(_.asText()),
          externalDocs = extDocs,
          specJson = Option(e.get("spec")).map(_.toString))
      })
    }
  }

  def fromFile(path: String): Seq[ConnectorMetadata] =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** `get_available_connectors` (registry.py:292-357). */
  def availableConnectors(
      registry: Seq[ConnectorMetadata],
      installType: Option[InstallType.Value] = None): Seq[String] =
    registry
      .filter(m => installType.forall(m.installTypes.contains))
      .map(_.canonicalName).sorted

  /** `get_connector_metadata` (registry.py:262-289): case-insensitive. */
  def connectorMetadata(
      registry: Seq[ConnectorMetadata], name: String): Option[ConnectorMetadata] =
    registry.find(_.canonicalName == name.toLowerCase(java.util.Locale.ROOT))
}
