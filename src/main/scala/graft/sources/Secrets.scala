package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Secrets management for connector configs (reference
 * `airbyte/secrets/base.py:38-208`, `env_vars.py`, `util.py:get_secret`):
 * a redacting string wrapper + pluggable managers resolved in order.
 *
 * Cluster note: secrets resolve ON THE DRIVER and travel to executors
 * only inside already-constructed connector configs (the same boundary
 * the reference draws: secrets hydrate config before the sync starts).
 * Nothing here logs or serializes the raw value — `toString` is the
 * redaction point because Spark's task serialization and log sinks all
 * funnel through it.
 */
object Secrets {

  /** `SecretString` (base.py:38-102): redacts in toString/repr; the raw
    * value must be requested explicitly. */
  final class SecretString(private val value: String) {
    def unwrap: String = value
    def isEmpty: Boolean = value.isEmpty
    def isJson: Boolean =
      try { Secrets.mapper.readTree(value); value.trim.startsWith("{") }
      catch { case _: Exception => false }
    /** `parse_json` (base.py:88-102). */
    def parseJson: JsonNode = {
      if (!isJson) throw new graft.errors.GraftInputError(
        "Secret value is not valid JSON.",
        guidance = Some("parseJson requires the secret to hold a JSON " +
          "object; use unwrap for plain string secrets."))
      Secrets.mapper.readTree(value)
    }
    override def toString: String = "<SecretString: ****>"
    override def equals(o: Any): Boolean = o match {
      case s: SecretString => s.value == value
      case _ => false
    }
    override def hashCode(): Int = value.hashCode
  }

  /** `SecretManager` (base.py:146-208). */
  trait SecretManager {
    def name: String
    def getSecret(secretName: String): Option[SecretString]
  }

  /** `EnvVarSecretManager` (env_vars.py:18-28). */
  final class EnvVarSecretManager(env: Map[String, String] = sys.env)
      extends SecretManager {
    val name = "env"
    def getSecret(secretName: String): Option[SecretString] =
      env.get(secretName).map(new SecretString(_))
  }

  /** `DotenvSecretManager` (env_vars.py:31-67): KEY=VALUE lines, `#`
    * comments; a missing or unparsable file resolves nothing. */
  final class DotenvSecretManager(val dotenvPath: String = ".env")
      extends SecretManager {
    val name = s"dotenv:$dotenvPath"
    private def entries: Map[String, String] = {
      val p = java.nio.file.Paths.get(dotenvPath)
      if (!java.nio.file.Files.isReadable(p)) return Map.empty
      try {
        java.nio.file.Files.readAllLines(p).toArray(Array.empty[String]).toSeq
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
          .map { l =>
            val Array(k, v) = l.split("=", 2)
            k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
          }.toMap
      } catch { case _: Exception => Map.empty }
    }
    def getSecret(secretName: String): Option[SecretString] =
      entries.get(secretName).map(new SecretString(_))
    /** Names only, values never returned (reference
      * `list_secrets_names`, env_vars.py; MCP `list_dotenv_secrets`). */
    def listSecretNames: Seq[String] = entries.keys.toSeq.sorted
  }

  private[graft] val mapper = new ObjectMapper()

  /** `SECRETS_HYDRATION_PREFIX` (reference constants.py:194): config
    * string values of the form `secret_reference::NAME` are resolved
    * by name through the registered secret managers. */
  val HydrationPrefix = "secret_reference::"

  final class SecretNotFoundException(val secretName: String)
    extends RuntimeException(
      s"Secret not found: '$secretName' was not resolved by any " +
        "registered secret manager") with graft.errors.GraftError {
    override def baseMessage: String = s"Secret not found: '$secretName'."
    override def guidance: Option[String] = Some(
      "Register a secret manager that provides this name (env var, " +
        ".env file, or a custom SecretManager), or pass the value directly.")
    override def context: scala.collection.immutable.ListMap[String, Any] =
      scala.collection.immutable.ListMap("secret_name" -> secretName)
  }

  // ------------------------------------------------------------------
  // Ordered secret-source registry (reference secrets/config.py:14-76):
  // a process-global, ordered list; front wins. Defaults seed lazily.
  // ------------------------------------------------------------------

  private val registry = new java.util.concurrent.CopyOnWriteArrayList[SecretManager]()
  @volatile private var seeded = false

  private def defaultSources: Seq[SecretManager] =
    Seq(new EnvVarSecretManager(), new DotenvSecretManager())

  private def ensureSeeded(): Unit = synchronized {
    if (!seeded) { registry.clear(); defaultSources.foreach(registry.add); seeded = true }
  }

  /** `_get_secret_sources` (config.py:17-32): current ordered sources
    * (a copy; mutations go through register/disable/clear). */
  def secretSources: Seq[SecretManager] = {
    ensureSeeded()
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq
  }

  /** `register_secret_manager` (config.py:39-55): front of the list by
    * default (highest priority); `asBackup` appends instead. */
  def registerSecretManager(
      manager: SecretManager,
      asBackup: Boolean = false,
      replaceExisting: Boolean = false): Unit = synchronized {
    ensureSeeded()
    if (replaceExisting) registry.clear()
    if (asBackup) registry.add(manager) else registry.add(0, manager)
  }

  /** `clear_secret_sources` (config.py:58-60). */
  def clearSecretSources(): Unit = synchronized { ensureSeeded(); registry.clear() }

  /** `disable_secret_source` (config.py:63-76): remove by instance or name. */
  def disableSecretSource(source: AnyRef): Unit = synchronized {
    ensureSeeded()
    import scala.jdk.CollectionConverters._
    source match {
      case m: SecretManager if registry.contains(m) => registry.remove(m); ()
      case _ =>
        registry.asScala.filter(_.name == source.toString)
          .foreach(m => registry.remove(m))
    }
  }

  /** Test hook: restore the default env+dotenv ordering. */
  def resetSecretSources(): Unit = synchronized {
    registry.clear(); defaultSources.foreach(registry.add); seeded = true
  }

  /**
   * `CustomSecretManager` (reference secrets/custom.py:14-60): extension
   * point for user-supplied secret stores. Auto-registers at
   * construction by default; `replaceExisting` evicts the default
   * sources, `asBackup` appends at lowest priority. Flags are `def`s so
   * subclass overrides are visible during construction.
   */
  abstract class CustomSecretManager extends SecretManager {
    protected def autoRegister: Boolean = true
    protected def replaceExisting: Boolean = false
    protected def asBackup: Boolean = false
    if (autoRegister) register()
    def register(
        replaceExisting: Option[Boolean] = None,
        asBackup: Option[Boolean] = None): Unit =
      registerSecretManager(this,
        asBackup = asBackup.getOrElse(this.asBackup),
        replaceExisting = replaceExisting.getOrElse(this.replaceExisting))
  }

  /** `SecretsPrompt` (reference secrets/prompt.py:10-28): interactive
    * fallback. The reader is injectable (tests; headless JVMs have no
    * console); the default masks input via `Console.readPassword` and
    * suppresses any terminal error into None, like the reference. */
  final class SecretsPrompt(
      reader: String => Option[String] = SecretsPrompt.consoleReader)
      extends SecretManager {
    val name = "prompt"
    def getSecret(secretName: String): Option[SecretString] =
      try reader(s"Enter the value for secret '$secretName': ")
        .map(new SecretString(_))
      catch { case _: Exception => None }
  }

  object SecretsPrompt {
    def consoleReader(prompt: String): Option[String] =
      Option(System.console()).flatMap(c =>
        Option(c.readPassword(prompt)).map(new String(_)))
  }

  /** `get_secret` (secrets/util.py:63-…): first manager that resolves
    * wins; empty-string secrets count as not found; a leading
    * `secret_reference::` prefix is stripped (util.py:86-89). Managers
    * default to the registered ordered sources. */
  def getSecret(
      secretName: String,
      managers: Seq[SecretManager] = null): Option[SecretString] = {
    val name =
      if (secretName.startsWith(HydrationPrefix))
        secretName.substring(HydrationPrefix.length).dropWhile(_.isWhitespace)
      else secretName
    val ms = if (managers == null) secretSources else managers
    ms.iterator
      .flatMap(_.getSecret(name))
      .find(!_.isEmpty)
  }

  /** `is_secret_available` (util.py:16-30). */
  def isSecretAvailable(secretName: String): Boolean =
    getSecret(secretName).isDefined

  // ------------------------------------------------------------------
  // Config hydration (reference secrets/hydration.py:20-56)
  // ------------------------------------------------------------------

  /**
   * `hydrate_secrets` (hydration.py:40-56): deep-copy the config and
   * replace every string value starting with `secret_reference::` with
   * the named secret's value. Recursion mirrors the reference exactly:
   * object values recurse, list items recurse ONLY when they are
   * objects (a bare string inside a list is left alone —
   * hydration.py:31-34). A reference that no manager resolves throws
   * [[SecretNotFoundException]] (the reference's
   * PyAirbyteSecretNotFoundError from get_secret).
   */
  def hydrateSecrets(configJson: String): String = {
    val root = mapper.readTree(configJson)
    if (!root.isObject)
      throw new graft.errors.GraftInputError(
        "config must be a JSON object",
        guidance = Some("Pass the connector config as a JSON object " +
          "(`{...}`), not a scalar or array."),
        context = scala.collection.immutable.ListMap(
          "config_node_type" -> root.getNodeType.toString))
    val copy = root.deepCopy[JsonNode]()
    hydrateObject(copy.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
    mapper.writeValueAsString(copy)
  }

  private def hydrateObject(
      obj: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
    import scala.jdk.CollectionConverters._
    obj.fields().asScala.toSeq.foreach { e =>
      e.getValue match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode => hydrateObject(o)
        case a: com.fasterxml.jackson.databind.node.ArrayNode =>
          a.elements().asScala.foreach {
            case o: com.fasterxml.jackson.databind.node.ObjectNode => hydrateObject(o)
            case _ => () // non-object list items are not hydrated (reference parity)
          }
        case v if v.isTextual && v.asText().startsWith(HydrationPrefix) =>
          val resolved = getSecret(v.asText())
            .getOrElse(throw new SecretNotFoundException(
              v.asText().substring(HydrationPrefix.length).trim))
          obj.put(e.getKey, resolved.unwrap); ()
        case _ => ()
      }
    }
  }

  /** Hydrate a flat string→string config (the [[DeclarativeSource]]
    * config shape): values with the hydration prefix resolve, others
    * pass through. */
  def hydrateConfigMap(config: Map[String, String]): Map[String, String] =
    config.map { case (k, v) =>
      if (v.startsWith(HydrationPrefix))
        k -> getSecret(v).getOrElse(throw new SecretNotFoundException(
          v.substring(HydrationPrefix.length).trim)).unwrap
      else k -> v
    }

  /** `_contains_secret_reference` (mcp/_arg_resolvers.py:22-30): any
    * string at any depth with the prefix — note lists DO check bare
    * strings here, unlike hydration's recursion. */
  def containsSecretReference(node: JsonNode): Boolean = {
    import scala.jdk.CollectionConverters._
    if (node.isTextual) node.asText().startsWith(HydrationPrefix)
    else if (node.isObject || node.isArray)
      node.elements().asScala.exists(containsSecretReference)
    else false
  }

  /** `deep_update` (hydration.py:59-74): merge `source` into `target`
    * recursively — nested objects merge key-wise, everything else
    * overwrites. Returns the merged document. */
  def deepUpdate(targetJson: String, sourceJson: String): String = {
    val target = mapper.readTree(targetJson)
      .deepCopy[JsonNode]().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val source = mapper.readTree(sourceJson)
    deepUpdateNode(target, source)
    mapper.writeValueAsString(target)
  }

  private def deepUpdateNode(
      target: com.fasterxml.jackson.databind.node.ObjectNode,
      source: JsonNode): Unit = {
    import scala.jdk.CollectionConverters._
    source.fields().asScala.foreach { e =>
      (target.get(e.getKey), e.getValue) match {
        case (t: com.fasterxml.jackson.databind.node.ObjectNode, s) if s.isObject =>
          deepUpdateNode(t, s)
        case _ => target.set(e.getKey, e.getValue.deepCopy[JsonNode]()); ()
      }
    }
  }

  /**
   * `detect_hardcoded_secrets` (hydration.py:140-171): paths in the
   * config whose key chain touches a secret-marked property and whose
   * value is a hardcoded string (not a `secret_reference::`).
   *
   * The mask comes from the connector spec: a property schema with
   * `airbyte_secret: true`, `writeOnly: true`, or `format: "password"`
   * contributes its property name (`_get_connector_secrets_mask`,
   * hydration.py:122-137 — the reference's leaf-only `_walk_dict` makes
   * its `isinstance(field_value, dict)` check vacuous; we implement the
   * documented intent by matching the marker keys directly). Without a
   * spec the global mask applies, which is EMPTY offline
   * (hydration.py:95-101 AIRBYTE_OFFLINE_MODE) — this engine is
   * zero-egress, so the no-spec call never flags.
   */
  def detectHardcodedSecrets(
      configJson: String,
      specJsonSchema: Option[String] = None): Seq[Seq[String]] = {
    val mask: Set[String] = specJsonSchema match {
      case None => Set.empty
      case Some(spec) => connectorSecretsMask(mapper.readTree(spec)).toSet
    }
    if (mask.isEmpty) return Seq.empty
    val found = Seq.newBuilder[Seq[String]]
    def walk(node: JsonNode, path: List[String]): Unit = {
      import scala.jdk.CollectionConverters._
      if (node.isObject) {
        node.fields().asScala.foreach(e => walk(e.getValue, path :+ e.getKey))
      } else if (path.exists(mask) && node.isTextual &&
          !node.asText().startsWith(HydrationPrefix)) {
        found += path
      }
    }
    walk(mapper.readTree(configJson), Nil)
    found.result()
  }

  /** Property names a connector spec marks secret: `airbyte_secret`,
    * `writeOnly`, or `format: password` on the property schema. */
  def connectorSecretsMask(specSchema: JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val out = Seq.newBuilder[String]
    def walk(node: JsonNode, key: Option[String]): Unit = {
      if (node.isObject) {
        val secret =
          node.path("airbyte_secret").asBoolean(false) ||
          node.path("writeOnly").asBoolean(false) ||
          node.path("format").asText("") == "password"
        if (secret) key.foreach(out += _)
        node.fields().asScala.foreach(e => walk(e.getValue, Some(e.getKey)))
      } else if (node.isArray) {
        node.elements().asScala.foreach(walk(_, key))
      }
    }
    walk(specSchema, None)
    out.result().distinct
  }
}
