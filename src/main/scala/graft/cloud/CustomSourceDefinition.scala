package graft.cloud

import graft.errors.{GraftInputError, ManifestError}
import graft.sources.{DeclarativeSource, Source}

/**
 * Custom (connector-builder) source definitions — the reference's
 * YAML-manifest definition lifecycle (`airbyte/cloud/connectors.py:
 * 362-712` `CustomCloudSourceDefinition` + `workspaces.py:781-977`
 * publish/list/get): a declarative manifest published as a reusable
 * connector definition, deployable as sources, updatable, and
 * guard-railed for deletion.
 *
 * The engine already interprets declarative manifests
 * ([[graft.sources.DeclarativeSource]]), so a definition here is
 * object-model plumbing: named, versioned manifest text + a draft slot
 * (the reference's connector-builder project draft,
 * `connectors.py:512-640`). Only YAML definitions exist — the
 * reference itself raises NotImplementedError for Docker definitions,
 * and a zero-egress build has no registry to pull images from.
 */
final case class CustomSourceDefinitionInfo(
    definitionId: String,
    name: String,
    manifestYaml: String,
    /** Manifest `version` field (reference `version` property). */
    version: Option[String],
    definitionType: String = "yaml")

object CustomSourceDefinitions {

  /** `validate_yaml_manifest` (`api_util.py:1897-1933`): must parse to
    * a mapping, declare `version` and `type`, and be a
    * DeclarativeSource. Error messages mirror the reference. */
  def validateManifest(manifestYaml: String): Unit = {
    val node =
      try new com.fasterxml.jackson.dataformat.yaml.YAMLMapper().readTree(manifestYaml)
      catch { case scala.util.control.NonFatal(_) => null }
    if (node == null || !node.isObject)
      throw new ManifestError("Manifest must be a dictionary")
    val missing = Seq("version", "type").filterNot(node.has)
    if (missing.nonEmpty)
      throw new ManifestError(
        s"Manifest missing required fields: ${missing.mkString(", ")}",
        Map("missing_fields" -> missing.mkString(", ")))
    val t = node.get("type").asText()
    if (t != "DeclarativeSource")
      throw new ManifestError(
        s"Manifest type must be 'DeclarativeSource', got '$t'",
        Map("manifest_type" -> t))
  }

  private[cloud] def manifestVersion(manifestYaml: String): Option[String] =
    try Option(new com.fasterxml.jackson.dataformat.yaml.YAMLMapper()
      .readTree(manifestYaml).get("version")).map(_.asText())
    catch { case scala.util.control.NonFatal(_) => None }
}

/** Handle on one published definition (reference
  * `CustomCloudSourceDefinition`). */
final class CustomCloudSourceDefinition(
    val workspace: CloudWorkspace, val definitionId: String) {

  private def registry = workspace.definitionRegistry

  def info: CustomSourceDefinitionInfo =
    registry.getOrElse(definitionId, throw new NoSuchElementException(
      s"unknown custom source definition '$definitionId'"))

  def name: String = info.name
  def manifestYaml: String = info.manifestYaml
  def version: Option[String] = info.version
  def definitionType: String = info.definitionType

  /** `update_definition` (`connectors.py:654-712`): replace the
    * manifest (optionally pre-validated); version refreshes from it. */
  def updateDefinition(
      manifestYaml: String, preValidate: Boolean = true): CustomCloudSourceDefinition = {
    if (preValidate) CustomSourceDefinitions.validateManifest(manifestYaml)
    val cur = info
    registry.put(definitionId, cur.copy(
      manifestYaml = manifestYaml,
      version = CustomSourceDefinitions.manifestVersion(manifestYaml)))
    this
  }

  // -- connector-builder draft slot (reference `connectors.py:512-640`:
  //    has_draft / draft_manifest over the builder project). Drafts live
  //    in the workspace registry so every handle on this definition
  //    observes the same draft. --
  def setDraftManifest(manifestYaml: String): Unit = {
    info; workspace.draftRegistry.put(definitionId, manifestYaml); ()
  }
  def clearDraft(): Unit = { workspace.draftRegistry.remove(definitionId); () }
  def hasDraft: Boolean = { info; workspace.draftRegistry.contains(definitionId) }
  def draftManifest: Option[String] = { info; workspace.draftRegistry.get(definitionId) }

  /** `permanently_delete` (`connectors.py:625-652`): with `safeMode`
    * the display name must contain "delete-me" or "deleteme"
    * (case-insensitive) — the reference's guard against deleting a
    * production definition. */
  def permanentlyDelete(safeMode: Boolean = true): Unit = {
    val n = info.name.toLowerCase(java.util.Locale.ROOT)
    if (safeMode && !n.contains("delete-me") && !n.contains("deleteme"))
      throw new GraftInputError(
        s"Refusing to delete definition '${info.name}': safe mode requires " +
          "the name to contain 'delete-me' or 'deleteme'.",
        guidance = Some("Rename it first or pass safeMode=false."),
        context = scala.collection.immutable.ListMap(
          "definition_name" -> info.name))
    registry.remove(definitionId)
    workspace.draftRegistry.remove(definitionId); ()
  }

  /** Deploy a source from this definition (the cloud flow: a published
    * definition becomes a workspace source with per-deploy config). */
  def deploySource(
      name: String,
      config: Map[String, String] = Map.empty,
      fixtureRoot: Option[String] = None): String = {
    val src: Source = new DeclarativeSource(name, info.manifestYaml, config, fixtureRoot)
    workspace.deploySource(name, src)
  }
}
