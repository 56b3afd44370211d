package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Registry, Secrets}
import graft.sources.Registry.InstallType

/** Registry catalog + secrets resolution (driver-side surfaces). */
class RegistrySecretsSpec extends AnyFunSuite {

  private val registryJson =
    """{"sources": [
      |  {"dockerRepository": "airbyte/source-faker", "dockerImageTag": "6.2.0",
      |   "supportLevel": "certified", "language": "python",
      |   "documentationUrl": "https://docs.airbyte.com/integrations/sources/faker",
      |   "spec": {"connectionSpecification": {"type": "object", "properties": {"count": {"type": "integer"}}}},
      |   "externalDocumentationUrls": [
      |     {"title": "Faker API", "url": "https://faker.example/docs", "type": "api_reference"}],
      |   "remoteRegistries": {"pypi": {"enabled": true, "packageName": "airbyte-source-faker"}}},
      |  {"dockerRepository": "airbyte/source-pokeapi", "dockerImageTag": "0.2.0",
      |   "tags": ["language:manifest-only"]}
      |],
      |"destinations": [
      |  {"dockerRepository": "airbyte/destination-duckdb", "dockerImageTag": "0.4.0",
      |   "language": "java"}
      |]}""".stripMargin

  test("registry parses names, languages, and install types") {
    val reg = Registry.fromJson(registryJson)
    assert(reg.map(_.name) == Seq("source-faker", "source-pokeapi", "destination-duckdb"))
    assert(Registry.availableConnectors(reg) ==
      Seq("destination-duckdb", "source-faker", "source-pokeapi"))
    assert(Registry.availableConnectors(reg, Some(InstallType.Python)) == Seq("source-faker"))
    assert(Registry.availableConnectors(reg, Some(InstallType.Yaml)) == Seq("source-pokeapi"))
    assert(Registry.availableConnectors(reg, Some(InstallType.Java)) == Seq("destination-duckdb"))
    val meta = Registry.connectorMetadata(reg, "Source-Faker").get
    assert(meta.dockerImageTag == "6.2.0" && meta.supportLevel.contains("certified"))
    assert(Registry.connectorMetadata(reg, "source-missing").isEmpty)
  }

  test("registry MCP tools: list filters, connector info, api docs urls") {
    import graft.mcp.RegistryTools
    val reg = Registry.fromJson(registryJson)
    assert(RegistryTools.listConnectors(reg) ==
      Seq("destination-duckdb", "source-faker", "source-pokeapi"))
    assert(RegistryTools.listConnectors(reg, keywordFilter = Some("poke")) ==
      Seq("source-pokeapi"))
    assert(RegistryTools.listConnectors(reg, connectorTypeFilter = Some("destination")) ==
      Seq("destination-duckdb"))
    assert(RegistryTools.listConnectors(reg,
      installTypes = Seq(InstallType.Python, InstallType.Yaml)) ==
      Seq("source-faker", "source-pokeapi"))
    intercept[IllegalArgumentException](
      RegistryTools.listConnectors(reg, connectorTypeFilter = Some("bogus")))

    val info = RegistryTools.getConnectorInfo(reg, "source-faker").get
    assert(info("documentation_url") == "https://docs.airbyte.com/integrations/sources/faker")
    assert(info("config_spec_jsonschema").contains("\"count\""))
    assert(info("manifest_url") ==
      "https://connectors.airbyte.com/files/metadata/airbyte/source-faker/latest/manifest.yaml")
    assert(RegistryTools.getConnectorInfo(reg, "source-missing").isEmpty)

    val docs = RegistryTools.getApiDocsUrls(reg, "source-faker").get
    assert(docs.map(_.title) == Seq("Airbyte Documentation", "Faker API"))
    assert(docs(1).docType == "api_reference" && !docs(1).requiresLogin)
    // a connector with neither docs field yields an empty list, not None
    assert(RegistryTools.getApiDocsUrls(reg, "source-pokeapi").get.isEmpty)
  }

  test("secrets resolve env-first then dotenv, redact, and parse JSON") {
    val dotenv = Files.createTempFile("graft-test", ".env")
    Files.write(dotenv,
      """# comment
        |FROM_DOTENV=dotenv-value
        |SHADOWED=dotenv-loses
        |CREDS_JSON={"user": "u", "pass": "p"}
        |EMPTY=
        |""".stripMargin.getBytes)
    val managers = Seq(
      new Secrets.EnvVarSecretManager(Map("FROM_ENV" -> "env-value", "SHADOWED" -> "env-wins")),
      new Secrets.DotenvSecretManager(dotenv.toString))

    assert(Secrets.getSecret("FROM_ENV", managers).get.unwrap == "env-value")
    assert(Secrets.getSecret("FROM_DOTENV", managers).get.unwrap == "dotenv-value")
    assert(Secrets.getSecret("SHADOWED", managers).get.unwrap == "env-wins")
    assert(Secrets.getSecret("MISSING", managers).isEmpty)
    assert(Secrets.getSecret("EMPTY", managers).isEmpty) // empty ⇒ not found

    val s = Secrets.getSecret("CREDS_JSON", managers).get
    assert(s.toString == "<SecretString: ****>") // never the raw value
    assert(s"interpolated: $s" == "interpolated: <SecretString: ****>")
    assert(s.parseJson.get("user").asText() == "u")
    val plain = Secrets.getSecret("FROM_ENV", managers).get
    assert(!plain.isJson)
    intercept[IllegalArgumentException](plain.parseJson)
  }

  test("config hydration: secret_reference:: values resolve at any depth, lists only for objects") {
    Secrets.resetSecretSources()
    try {
      Secrets.registerSecretManager(
        new Secrets.EnvVarSecretManager(Map(
          "API_KEY" -> "k-123", "DB_PASS" -> "p-456", "NESTED" -> "n-789")))
      val config =
        """{"api_key":"secret_reference::API_KEY",
          |"host":"example.com",
          |"db":{"password":"secret_reference:: DB_PASS","port":5432},
          |"accounts":[{"token":"secret_reference::NESTED"},"secret_reference::API_KEY"],
          |"not_a_ref":"prefix secret_reference::API_KEY inside"}""".stripMargin
      val hydrated = Secrets.mapper.readTree(Secrets.hydrateSecrets(config))
      assert(hydrated.get("api_key").asText() == "k-123")
      assert(hydrated.get("host").asText() == "example.com")
      // prefix strip tolerates whitespace after '::' (util.py:86-89 lstrip)
      assert(hydrated.get("db").get("password").asText() == "p-456")
      assert(hydrated.get("db").get("port").asInt() == 5432)
      // object INSIDE a list hydrates; a bare string in a list does not
      // (hydration.py:31-34 recurses only into dict list items)
      assert(hydrated.get("accounts").get(0).get("token").asText() == "n-789")
      assert(hydrated.get("accounts").get(1).asText() == "secret_reference::API_KEY")
      // only values STARTING with the prefix are references
      assert(hydrated.get("not_a_ref").asText().contains("secret_reference::"))
      // the original is unchanged (deep-copy semantics)
      assert(config.contains("secret_reference::API_KEY"))

      // containment probe (the MCP trusted-execution gate) DOES see
      // bare strings in lists — asymmetry matches _arg_resolvers.py:22-30
      assert(Secrets.containsSecretReference(
        Secrets.mapper.readTree("""{"a":["secret_reference::X"]}""")))
      assert(!Secrets.containsSecretReference(
        Secrets.mapper.readTree("""{"a":["x secret_reference::X"]}""")))

      // an unresolvable reference fails loudly with the secret's name
      val missing = intercept[Secrets.SecretNotFoundException](
        Secrets.hydrateSecrets("""{"k":"secret_reference::NOPE"}"""))
      assert(missing.secretName == "NOPE")
    } finally Secrets.resetSecretSources()
  }

  test("deep_update merges nested objects key-wise, scalars overwrite") {
    val merged = Secrets.mapper.readTree(Secrets.deepUpdate(
      """{"a":1,"nest":{"keep":"x","old":"y"},"gone":true}""",
      """{"nest":{"old":"z","new":"w"},"gone":false,"added":[1]}"""))
    assert(merged.get("a").asInt() == 1)
    assert(merged.get("nest").get("keep").asText() == "x")
    assert(merged.get("nest").get("old").asText() == "z")
    assert(merged.get("nest").get("new").asText() == "w")
    assert(!merged.get("gone").asBoolean())
    assert(merged.get("added").isArray)
  }

  test("hardcoded-secret detection masks spec-marked properties; references pass") {
    val spec =
      """{"type":"object","properties":{
        |"api_key":{"type":"string","airbyte_secret":true},
        |"password":{"type":"string","format":"password"},
        |"token":{"type":"string","writeOnly":true},
        |"host":{"type":"string"},
        |"tunnel":{"type":"object","properties":{
        |  "tunnel_password":{"type":"string","airbyte_secret":true}}}}}""".stripMargin
    assert(Secrets.connectorSecretsMask(Secrets.mapper.readTree(spec)).sorted ==
      Seq("api_key", "password", "token", "tunnel_password"))

    val config =
      """{"api_key":"HARDCODED","host":"ok.example",
        |"password":"secret_reference::PW",
        |"tunnel":{"tunnel_password":"also-hardcoded"}}""".stripMargin
    val found = Secrets.detectHardcodedSecrets(config, Some(spec))
    assert(found.map(_.mkString(".")).sorted ==
      Seq("api_key", "tunnel.tunnel_password"))
    // no spec → global mask, which is empty offline (hydration.py:95-101)
    assert(Secrets.detectHardcodedSecrets(config, None).isEmpty)
  }

  test("custom secret manager: auto-register, priority, backup, replace, disable") {
    Secrets.resetSecretSources()
    try {
      class FixedManager(val name: String, entries: Map[String, String],
          back: Boolean = false) extends Secrets.CustomSecretManager {
        override protected def asBackup: Boolean = back
        def getSecret(n: String): Option[Secrets.SecretString] =
          entries.get(n).map(new Secrets.SecretString(_))
      }
      // env manager sees nothing for CUSTOM_ONLY; custom front-runs
      new FixedManager("vault", Map("CUSTOM_ONLY" -> "v1", "PATH" -> "masked"))
      assert(Secrets.secretSources.head.name == "vault")
      assert(Secrets.getSecret("CUSTOM_ONLY").get.unwrap == "v1")
      // front registration SHADOWS the env var manager
      assert(Secrets.getSecret("PATH").get.unwrap == "masked")

      // backup registration goes to the END (resolves only as fallback)
      new FixedManager("backup", Map("PATH" -> "never-wins", "B_ONLY" -> "b1"), back = true)
      assert(Secrets.secretSources.last.name == "backup")
      assert(Secrets.getSecret("PATH").get.unwrap == "masked")
      assert(Secrets.getSecret("B_ONLY").get.unwrap == "b1")

      // disable by name removes it
      Secrets.disableSecretSource("vault")
      assert(!Secrets.secretSources.exists(_.name == "vault"))
      assert(Secrets.getSecret("CUSTOM_ONLY").isEmpty)

      // replaceExisting evicts everything else
      class Exclusive extends Secrets.CustomSecretManager {
        override protected def replaceExisting: Boolean = true
        val name = "exclusive"
        def getSecret(n: String): Option[Secrets.SecretString] =
          if (n == "X") Some(new Secrets.SecretString("only")) else None
      }
      new Exclusive
      assert(Secrets.secretSources.map(_.name) == Seq("exclusive"))
      assert(Secrets.getSecret("X").get.unwrap == "only")
      assert(Secrets.getSecret("PATH").isEmpty) // env manager evicted
    } finally Secrets.resetSecretSources()
  }

  test("prompt fallback: masked interactive read, failure-safe, registry-ordered last") {
    Secrets.resetSecretSources()
    try {
      var prompted = Seq.empty[String]
      val prompt = new Secrets.SecretsPrompt(p => { prompted :+= p; Some("typed-secret") })
      Secrets.registerSecretManager(prompt, asBackup = true)
      // env resolves without prompting
      assert(Secrets.getSecret("PATH").isDefined && prompted.isEmpty)
      // unknown name falls through to the prompt
      assert(Secrets.getSecret("ASK_ME").get.unwrap == "typed-secret")
      assert(prompted == Seq("Enter the value for secret 'ASK_ME': "))
      // a reader that throws is suppressed to None (prompt.py:25-28)
      val broken = new Secrets.SecretsPrompt(_ => throw new RuntimeException("no tty"))
      assert(broken.getSecret("X").isEmpty)
    } finally Secrets.resetSecretSources()
  }

  /** Run `body` with the MCP trusted-execution gate forced on/off. */
  private def withTrustedExecution[T](enabled: Boolean)(body: => T): T = {
    import graft.mcp.TrustedExecution
    val prev = TrustedExecution.envReader
    TrustedExecution.envReader =
      name => if (name == TrustedExecution.EnvVar && enabled) Some("true") else None
    try body finally TrustedExecution.envReader = prev
  }

  test("resolveConnectorConfig: trusted-execution gate on filesystem/secret paths") {
    import graft.mcp.{LocalTools, TrustedExecution}
    Secrets.resetSecretSources()
    try {
      val f = Files.createTempFile("graft-cfg", ".json")
      Files.write(f, """{"host":"h1"}""".getBytes)
      Secrets.registerSecretManager(new Secrets.EnvVarSecretManager(Map(
        "CFG_SECRET" -> """{"token":"t"}""")))
      withTrustedExecution(enabled = false) {
        assert(!TrustedExecution.isEnabled)
        // the three trusted-machine inputs hard-fail when the gate is off
        // (_arg_resolvers.py:119,165,188 via _guards.py)
        val e1 = intercept[TrustedExecution.TrustedExecutionRequiredException](
          LocalTools.resolveConnectorConfig(configFile = Some(f.toString)))
        assert(e1.getMessage.contains(TrustedExecution.EnvVar))
        intercept[TrustedExecution.TrustedExecutionRequiredException](
          LocalTools.resolveConnectorConfig(configSecretName = Some("CFG_SECRET")))
        intercept[TrustedExecution.TrustedExecutionRequiredException](
          LocalTools.resolveConnectorConfig(
            config = Some("""{"k":"secret_reference::CFG_SECRET"}""")))
        // an already-resolved inline config stays available to untrusted
        // callers (hosted transports pass resolved configs)
        val ok = LocalTools.resolveConnectorConfig(config = Some("""{"host":"h9"}"""))
        assert(Secrets.mapper.readTree(ok).get("host").asText() == "h9")
      }
      // truthy parsing: 1/true/yes case-insensitive, anything else off.
      // envReader restored in finally — a failed assertion mid-loop must
      // not leak the stub into later tests in this JVM.
      try {
        for (v <- Seq("1", "true", "YES", " Yes ")) {
          TrustedExecution.envReader =
            n => if (n == TrustedExecution.EnvVar) Some(v) else None
          assert(TrustedExecution.isEnabled, s"expected '$v' to enable")
        }
        for (v <- Seq("0", "false", "no", "", "on")) {
          TrustedExecution.envReader =
            n => if (n == TrustedExecution.EnvVar) Some(v) else None
          assert(!TrustedExecution.isEnabled, s"expected '$v' to disable")
        }
      } finally TrustedExecution.envReader = n => sys.env.get(n)
    } finally Secrets.resetSecretSources()
  }

  test("resolveConnectorConfig: file + inline + secret-name merge, hardcoded rejection") {
    import graft.mcp.LocalTools
    Secrets.resetSecretSources()
    withTrustedExecution(enabled = true) { try {
      val f = Files.createTempFile("graft-cfg", ".json")
      Files.write(f, """{"host":"h1","nest":{"a":1,"b":2}}""".getBytes)
      Secrets.registerSecretManager(new Secrets.EnvVarSecretManager(Map(
        "CFG_SECRET" -> """{"nest":{"b":99},"token":"t"}""")))

      // file then inline overlay then secret deep-merge (secrets win)
      val resolved = Secrets.mapper.readTree(LocalTools.resolveConnectorConfig(
        config = Some("""{"host":"h2"}"""),
        configFile = Some(f.toString),
        configSecretName = Some("CFG_SECRET")))
      assert(resolved.get("host").asText() == "h2")
      assert(resolved.get("nest").get("a").asInt() == 1)
      assert(resolved.get("nest").get("b").asInt() == 99)
      assert(resolved.get("token").asText() == "t")

      // nothing provided → empty config
      assert(LocalTools.resolveConnectorConfig() == "{}")
      // missing file is loud
      intercept[java.io.FileNotFoundException](
        LocalTools.resolveConnectorConfig(configFile = Some("/nope/missing.json")))
      // hardcoded secret + spec → rejected with the field path
      val spec = """{"properties":{"api_key":{"airbyte_secret":true}}}"""
      val err = intercept[IllegalArgumentException](LocalTools.resolveConnectorConfig(
        config = Some("""{"api_key":"oops"}"""),
        configSpecJsonSchema = Some(spec)))
      assert(err.getMessage.contains("api_key"))
      // ...but a reference-passed secret is fine
      val ok = LocalTools.resolveConnectorConfig(
        config = Some("""{"api_key":"secret_reference::K"}"""),
        configSpecJsonSchema = Some(spec))
      assert(ok.contains("secret_reference::K"))
    } finally Secrets.resetSecretSources() }
  }
}
