package graft.mcp

import java.util.Locale

/**
 * Trusted-execution master gate for the MCP server's trusted-machine
 * capabilities (reference `airbyte/mcp/_guards.py:1-51`): local
 * filesystem access, connector installation/execution, and server-side
 * secret resolution. Controlled solely by the
 * `GRAFT_MCP_TRUSTED_EXECUTION` environment variable — `1`/`true`/`yes`
 * (case-insensitive) enables it; anything else, including unset, leaves
 * it DISABLED on every transport.
 *
 * This is a function-layer control, independent of any tool-listing
 * visibility filtering: backend helpers call [[requireTrusted]] so a
 * direct call hard-fails when the gate is off, even if a registration
 * mistake left the corresponding tool visible. Because the two layers
 * are independent, a mistake in either one alone cannot expose a
 * trusted-machine capability to an untrusted (e.g. hosted HTTP) caller.
 */
object TrustedExecution {

  /** Server environment variable controlling the gate
    * (reference `airbyte/constants.py` MCP_TRUSTED_EXECUTION_ENV_VAR). */
  val EnvVar = "GRAFT_MCP_TRUSTED_EXECUTION"

  private val Truthy = Set("1", "true", "yes")

  /** Environment reader — injectable so specs can exercise both sides
    * of the gate without mutating the JVM's real environment. */
  @volatile private[graft] var envReader: String => Option[String] =
    name => sys.env.get(name)

  /** Raised when a trusted-machine capability is invoked while the
    * gate is disabled (reference AirbyteTrustedExecutionRequiredError). */
  final class TrustedExecutionRequiredException(val feature: String)
      extends RuntimeException(
        s"Trusted execution is required for: $feature.")
      with graft.errors.GraftError {
    override def baseMessage: String =
      s"Trusted execution is required for: $feature."
    override def guidance: Option[String] = Some(
      s"Set $EnvVar=1 in the server environment to enable " +
        "trusted-machine capabilities (local filesystem access, " +
        "connector execution, server-side secret resolution).")
    override def context: scala.collection.immutable.ListMap[String, Any] =
      scala.collection.immutable.ListMap("feature" -> feature)
  }

  /** Whether trusted execution is enabled (`_guards.py:29-37`). */
  def isEnabled: Boolean =
    envReader(EnvVar).exists(v => Truthy(v.trim.toLowerCase(Locale.ROOT)))

  /** Hard-fail `feature` when the gate is off (`_guards.py:40-51`). */
  def requireTrusted(feature: String): Unit =
    if (!isEnabled) throw new TrustedExecutionRequiredException(feature)
}
