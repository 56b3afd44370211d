package graft.sources

import graft.protocol.ConfiguredCatalog

/**
 * Source factory front door — the reference's `get_source` dispatch
 * (`airbyte/sources/util.py:47-140`): pick an executor from the
 * mutually-exclusive install options. In this zero-egress build the
 * supported paths are
 *
 *  - `localExecutable`: a pre-installed connector binary →
 *    [[SubprocessSource]] (the reference's `local_executable=`);
 *  - `sourceManifest`: declarative YAML → [[DeclarativeSource]]
 *    (the reference's `source_manifest=`), with `fixtureRoot` standing
 *    in for network access;
 *
 * `pip`/`docker` auto-install (`_executors/python.py`, `docker.py`) is
 * out of scope without egress — requesting it raises the same "cannot
 * install" error class the reference raises when installation fails,
 * rather than pretending.
 */
object Sources {

  def getSource(
      name: String,
      localExecutable: Option[Seq[String]] = None,
      catalog: Option[ConfiguredCatalog] = None,
      sourceManifest: Option[String] = None,
      manifestPath: Option[String] = None,
      config: Map[String, String] = Map.empty,
      fixtureRoot: Option[String] = None): Source = {
    val picked = Seq(localExecutable.isDefined,
      sourceManifest.isDefined, manifestPath.isDefined).count(identity)
    if (picked > 1)
      throw new graft.errors.GraftInputError(
        "localExecutable, sourceManifest and manifestPath are mutually exclusive",
        guidance = Some("Pass exactly one of localExecutable, " +
          "sourceManifest or manifestPath."),
        context = scala.collection.immutable.ListMap("source_name" -> name))
    (localExecutable, sourceManifest, manifestPath) match {
      case (Some(cmd), _, _) =>
        new SubprocessSource(name,
          catalog.getOrElse(throw new graft.errors.GraftInputError(
            "localExecutable needs a configured catalog (run discover first)",
            guidance = Some("Call discover() on the connector and pass " +
              "the resulting catalog."),
            context = scala.collection.immutable.ListMap("source_name" -> name))),
          cmd)
      case (_, Some(yaml), _) =>
        new DeclarativeSource(name, yaml, config, fixtureRoot)
      case (_, _, Some(path)) =>
        DeclarativeSource.fromFile(name, path, config, fixtureRoot)
      case _ =>
        throw new UnsupportedOperationException(
          s"Cannot install connector '$name': auto-install (pip/docker) " +
            "requires network access; pass localExecutable or a manifest")
    }
  }
}
