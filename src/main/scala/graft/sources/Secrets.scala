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
      if (!isJson) throw new IllegalArgumentException("Secret value is not valid JSON.")
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

  private[sources] val mapper = new ObjectMapper()

  /** `get_secret` (secrets/util.py): first manager that resolves wins;
    * empty-string secrets count as not found (allow_prompt=False path). */
  def getSecret(
      secretName: String,
      managers: Seq[SecretManager] = Seq(
        new EnvVarSecretManager(), new DotenvSecretManager())): Option[SecretString] =
    managers.iterator
      .flatMap(_.getSecret(secretName))
      .find(!_.isEmpty)
}
