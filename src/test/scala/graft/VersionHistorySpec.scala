package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mcp.RegistryTools
import graft.sources.Registry

/** Connector version history (reference `registry.py:544-618`
  * `get_connector_version_history` + `_registry_utils.py:13-96`
  * `parse_changelog_html` + the 4th MCP registry tool,
  * `mcp/registry.py:227-291`): golden parse of a recorded-shape
  * changelog fixture, PR extraction edge cases, the registry
  * release-candidate date override, and the tool-level membership /
  * limit semantics. */
class VersionHistorySpec extends AnyFunSuite {

  // The rendered docs.airbyte.com changelog table is MINIFIED html:
  // unclosed <td> cells, unquoted hrefs, each row terminated by the
  // NEXT row's <tr>. Reference row-regex semantics (verified against
  // the reference implementation on this exact fixture): a match
  // CONSUMES its terminating <tr>, so the row immediately following a
  // matched row is sacrificed — hence the interleaved filler rows that
  // keep each feature case (clean entry, multi-PR, no-PR, non-date
  // reject) on a matchable row. The golden assertions below are the
  // reference's output on this string, byte for byte.
  private val changelogHtml =
    "<h2>Changelog</h2><table><tbody>" +
      "<tr><td style=a>6.5.1<td style=a>2025-06-01<td style=a>" +
      "<a href=https://github.com/airbytehq/airbyte/pull/51234 target=_blank>51234</a>" +
      "<td style=a>Fix <code>rate-limit</code> &amp; retry &quot;once&quot;" +
      "<tr><td>skip-a<td>2025-05-25<td>n/a<td>consumed filler" +
      "<tr><td>6.5.0<td>2025-05-20<td>" +
      "<a href=https://github.com/airbytehq/airbyte/pull/50001>50001</a> " +
      "<a href=https://github.com/airbytehq/airbyte/pull/50002>50002</a>" +
      "<td>Dual &lt;merge&gt;" +
      "<tr><td>skip-b<td>2025-05-10<td>n/a<td>consumed filler" +
      "<tr><td>6.4.9<td>2025-05-01<td>n/a<td>Internal release" +
      "<tr><td>skip-c<td>2025-04-25<td>n/a<td>consumed filler" +
      "<tr><td>note<td>not-a-date<td>ignored<td>ignored" +
      "<tr><td>skip-d<td>2025-04-20<td>n/a<td>consumed by the rejected note row" +
      "<tr><td>6.4.8<td>2025-04-15<td>" +
      "<a href=https://github.com/airbytehq/airbyte/pull/49000>49000</a>" +
      "<td>Older fix" +
      "<tr></tbody></table>"

  private val registryJson =
    """{"sources": [
      |  {"dockerRepository": "airbyte/source-faker", "dockerImageTag": "6.5.1",
      |   "releases": {"releaseCandidates": {
      |     "6.5.1": {"generated": {"git": {"commit_timestamp": "2025-06-03T12:30:00Z"}}},
      |     "6.5.0": {"generated": {"git": {"commit_timestamp": "bogus"}}}}}}
      |]}""".stripMargin

  test("parseChangelogHtml: golden rows, PR extraction, entity unescape") {
    val vs = Registry.parseChangelogHtml(changelogHtml, "source-faker")
    // the last row has no trailing <tr> terminator and is dropped —
    // reference row-regex semantics (_registry_utils.py:31-33)
    assert(vs.map(_.version) == Seq("6.5.1", "6.5.0", "6.4.9", "6.4.8"))
    val v1 = vs.head
    assert(v1.releaseDate.contains("2025-06-01"))
    assert(v1.prUrl.contains("https://github.com/airbytehq/airbyte/pull/51234"))
    assert(v1.prTitle.contains("Fix rate-limit & retry \"once\""))
    assert(v1.dockerImageUrl ==
      "https://hub.docker.com/r/airbyte/source-faker/tags?name=6.5.1")
    assert(v1.changelogUrl ==
      "https://docs.airbyte.com/integrations/sources/faker#changelog")
    assert(v1.parsingErrors.isEmpty)
    val v2 = vs(1) // multiple PRs: first wins, error recorded
    assert(v2.prUrl.contains("https://github.com/airbytehq/airbyte/pull/50001"))
    assert(v2.prTitle.contains("Dual <merge>"))
    assert(v2.parsingErrors ==
      Seq("Multiple PRs found for version 6.5.0, using first PR: 50001"))
    val v3 = vs(2) // no PR link
    assert(v3.prUrl.isEmpty && v3.prTitle.isEmpty)
    assert(v3.parsingErrors ==
      Seq("No PR link found in changelog for version 6.4.9"))
  }

  test("destination connectors map to the destinations changelog url") {
    val vs = Registry.parseChangelogHtml(
      "<tr><td>1.0.0<td>2025-01-01<td>n/a<td>x<tr>", "destination-duckdb")
    assert(vs.head.changelogUrl ==
      "https://docs.airbyte.com/integrations/destinations/duckdb#changelog")
  }

  test("tool: membership gate, registry date override, limit") {
    val reg = Registry.fromJson(registryJson)
    assert(RegistryTools.getConnectorVersionHistory(
      reg, "source-missing", changelogHtml).isEmpty)
    val vs = RegistryTools.getConnectorVersionHistory(
      reg, "source-faker", changelogHtml).get
    // 6.5.1 sits in the validate window and has a parseable RC commit
    // date -> overridden; 6.5.0's timestamp is bogus -> changelog date
    assert(vs.head.releaseDate.contains("2025-06-03"))
    assert(vs(1).releaseDate.contains("2025-05-20"))
    // window smaller than the override target -> changelog date kept
    val unvalidated = RegistryTools.getConnectorVersionHistory(
      reg, "source-faker", changelogHtml, numVersionsToValidate = 0).get
    assert(unvalidated.head.releaseDate.contains("2025-06-01"))
    val limited = RegistryTools.getConnectorVersionHistory(
      reg, "source-faker", changelogHtml, limit = Some(2)).get
    assert(limited.map(_.version) == Seq("6.5.1", "6.5.0"))
    // unfetchable changelog -> empty list, not a failure
    assert(RegistryTools.getConnectorVersionHistory(
      reg, "source-faker", "").get.isEmpty)
  }
}
