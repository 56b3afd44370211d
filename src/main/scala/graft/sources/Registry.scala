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

  /** One changelog entry (reference `ConnectorVersionInfo`,
    * `registry.py:358-367`): the parsed row plus the derived DockerHub
    * and changelog URLs; `parsingErrors` records recoverable oddities
    * (no PR link, multiple PR links) instead of failing the row. */
  final case class ConnectorVersionInfo(
      version: String,
      releaseDate: Option[String],
      dockerImageUrl: String,
      changelogUrl: String,
      prUrl: Option[String] = None,
      prTitle: Option[String] = None,
      parsingErrors: Seq[String] = Seq.empty)

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
      specJson: Option[String] = None,
      /** Release-candidate commit dates (version → YYYY-MM-DD) from the
        * document's `releases.releaseCandidates[v].generated.git
        * .commit_timestamp` — the data `fetch_registry_version_date`
        * (reference `_registry_utils.py:99-121`) reads over HTTP,
        * captured at parse time so the date override is pure. */
      releaseCandidateDates: Map[String, String] = Map.empty) {
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
        val rcDates = Option(e.at("/releases/releaseCandidates"))
          .filter(_.isObject).map { rcs =>
            rcs.fields().asScala.flatMap { entry =>
              val ts = entry.getValue.at("/generated/git/commit_timestamp").asText("")
              DatePrefix.findPrefixOf(ts).map(d => entry.getKey -> d)
            }.toMap
          }.getOrElse(Map.empty[String, String])
        ConnectorMetadata(
          name = name,
          dockerRepository = repo,
          dockerImageTag = Option(e.get("dockerImageTag")).map(_.asText()).getOrElse(""),
          language = lang,
          supportLevel = Option(e.get("supportLevel")).map(_.asText()),
          installTypes = types.result(),
          documentationUrl = Option(e.get("documentationUrl")).map(_.asText()),
          externalDocs = extDocs,
          specJson = Option(e.get("spec")).map(_.toString),
          releaseCandidateDates = rcDates)
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

  private val DatePrefix = """\d{4}-\d{2}-\d{2}""".r

  // parse_changelog_html's row/PR shapes (_registry_utils.py:31-37): the
  // rendered docs page is minified HTML with unclosed <td> cells and
  // unquoted hrefs, so the row regex keys on the <tr><td...<td...<tr>
  // rhythm rather than well-formed markup.
  private val ChangelogRow =
    """(?s)<tr><td[^>]*>([^<]+)<td[^>]*>([^<]+)<td[^>]*>(.*?)<td[^>]*>(.*?)<tr>""".r
  private val PrLink =
    """<a href=https://github\.com/airbytehq/airbyte/pull/(\d+)[^>]*>(\d+)</a>""".r
  private val Tag = """<[^>]+>""".r

  /** Parse a connector docs changelog into version history — the pure
    * core of `get_connector_version_history` (reference
    * `_registry_utils.py:13-96` `parse_changelog_html`): one entry per
    * table row whose date cell starts with YYYY-MM-DD; the first PR
    * link wins (extras become a parsing error, a missing link another);
    * the subject cell is tag-stripped and entity-unescaped into the PR
    * title. The HTML is caller-supplied (zero-egress analog of the
    * reference's docs fetch). */
  def parseChangelogHtml(htmlContent: String,
      connectorName: String): Seq[ConnectorVersionInfo] = {
    val connectorType =
      if (connectorName.startsWith("source-")) "sources" else "destinations"
    val shortName = connectorName
      .replace("source-", "").replace("destination-", "")
    val changelogUrl =
      s"https://docs.airbyte.com/integrations/$connectorType/$shortName#changelog"
    ChangelogRow.findAllMatchIn(htmlContent).flatMap { m =>
      val version = m.group(1).trim
      val date = m.group(2).trim
      val prCell = m.group(3)
      val subject = m.group(4).trim
      if (DatePrefix.findPrefixOf(date).isEmpty) None
      else {
        val prMatches = PrLink.findAllMatchIn(prCell).toSeq
        val errors = Seq.newBuilder[String]
        val (prUrl, prTitle) = prMatches.headOption match {
          case Some(first) =>
            val prNumber = first.group(1)
            if (prMatches.length > 1) errors +=
              s"Multiple PRs found for version $version, using first PR: $prNumber"
            val title = Tag.replaceAllIn(subject, "")
              .replace("&quot;", "\"").replace("&amp;", "&")
              .replace("&lt;", "<").replace("&gt;", ">").trim
            (Some(s"https://github.com/airbytehq/airbyte/pull/$prNumber"),
              Some(title))
          case None =>
            errors += s"No PR link found in changelog for version $version"
            (None, None)
        }
        Some(ConnectorVersionInfo(
          version = version,
          releaseDate = Some(date).filter(_.nonEmpty),
          dockerImageUrl =
            s"https://hub.docker.com/r/airbyte/$connectorName/tags?name=$version",
          changelogUrl = changelogUrl,
          prUrl = prUrl,
          prTitle = prTitle,
          parsingErrors = errors.result()))
      }
    }.toSeq
  }

  /** The registry-date lookup `fetch_registry_version_date`
    * (_registry_utils.py:85-121) made pure: read the release-candidate
    * commit date for `version` out of the already-parsed document. */
  def registryVersionDate(registry: Seq[ConnectorMetadata],
      connectorName: String, version: String): Option[String] =
    connectorMetadata(registry, connectorName)
      .flatMap(_.releaseCandidateDates.get(version))
}
