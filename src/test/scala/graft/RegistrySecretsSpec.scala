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
}
