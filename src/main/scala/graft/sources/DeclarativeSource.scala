package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.fasterxml.jackson.dataformat.yaml.YAMLMapper
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.names.NameNormalizer
import graft.protocol.ConfiguredCatalog

/**
 * Declarative (low-code YAML manifest) source — the reference's
 * manifest-only connector path re-expressed for Spark, without network
 * egress.
 *
 * Reference surface: `airbyte/_executors/declarative.py:40-142`
 * (DeclarativeExecutor wrapping the CDK's declarative source) and
 * `airbyte/sources/util.py:107` (`get_source(..., source_manifest=...)`).
 * The manifest shape interpreted here is the public Airbyte CDK
 * declarative-component schema: `DeclarativeSource` with `spec`,
 * `check.stream_names`, and `streams[]` of `DeclarativeStream`
 * (`schema_loader`, `retriever.requester`, `retriever.record_selector
 * .extractor.field_path`, `retriever.partition_router`), with
 * `$ref: "#/definitions/..."` pointers and `{{ config['k'] }}` /
 * `{{ stream_slice['k'] }}` interpolation.
 *
 * No-egress semantics: the requester resolves to LOCAL files.
 *  - `file://` URLs and plain relative paths read from disk (relative
 *    paths resolve against `fixtureRoot`).
 *  - `http(s)://` URLs map into the fixture tree as
 *    `<fixtureRoot>/<host>/<path>` — so a REAL connector manifest runs
 *    unmodified against recorded API responses.
 * Interpreted component surface (CDK declarative schema semantics,
 * see `DeclarativeComponents`): `DefaultPaginator` (PageIncrement /
 * OffsetIncrement / CursorPagination — page N is one more recorded
 * fixture, `users?page=2.json`), `record_filter.condition`,
 * `AddFields`/`RemoveFields` transformations, `ListPartitionRouter`
 * and `SubstreamPartitionRouter` (parent-record slices), datetime
 * window slicing from `DatetimeBasedCursor` (start/end/step), and
 * `request_parameters`. Unsupported component types are rejected
 * loudly at parse time rather than silently ignored.
 *
 * Scale shape: slice resolution (manifest string work, plus parent
 * fixture reads for substreams) is driver-side; record extraction,
 * page walking, filtering, and transformation are executor-side —
 * slices parallelize one-per-partition, so a 10k-slice stream fans
 * out like any other distributed scan. Records then ride the standard
 * `Source.read` path (schema projection, metadata columns, write
 * strategies) unchanged.
 */
final class DeclarativeSource(
    val name: String,
    manifestYaml: String,
    config: Map[String, String] = Map.empty,
    fixtureRoot: Option[String] = None) extends Source {

  import DeclarativeSource._

  /** Config with `secret_reference::NAME` values resolved through the
    * registered secret managers — the reference hydrates config at the
    * connector boundary, not at construction
    * (`_connector_base.py:128,152`), so interpolation, auth headers,
    * and fixture paths all see the actual secret values, never the
    * reference strings. Lazy so a secret manager registered AFTER the
    * source is created (the CustomSecretManager auto-register pattern)
    * is still consulted, and an unresolvable reference fails at first
    * read rather than at construction. */
  private lazy val hydratedConfig: Map[String, String] = Secrets.hydrateConfigMap(config)

  /** Per-connector log file (reference `_connector_base.py:79` — every
    * connector object owns one): check/read progress at info, failures
    * at error. Lazy so constructing a source creates no file. */
  lazy val fileLogger: graft.logs.Logs.FileLogger =
    graft.logs.Logs.newPassthroughFileLogger(name)

  private val manifest: JsonNode = resolveRefs(parseYaml(manifestYaml))

  /** Manifest `version` (reference `declarative.py:82` reported_version). */
  val version: Option[String] =
    Option(manifest.get("version")).map(_.asText())

  /** The connector's `spec` connection_specification JSON, if declared. */
  def specJson: Option[String] =
    Option(manifest.get("spec"))
      .flatMap(s => Option(s.get("connection_specification")))
      .map(_.toString)

  private val streamNodes: Seq[JsonNode] =
    Option(manifest.get("streams")).toSeq.flatMap(_.elements().asScala)
      .map {
        case t if t.isTextual && t.asText().startsWith("#/") =>
          resolvePointer(manifest, t.asText())
        case n => n
      }

  private def streamName(s: JsonNode): String =
    Option(s.get("name")).map(_.asText()).getOrElse(
      throw new graft.errors.ManifestError("declarative stream without a name",
        Map("component" -> "stream")))

  private def streamByName(stream: String): JsonNode =
    streamNodes.find(s => streamName(s).equalsIgnoreCase(stream))
      .orElse(streamNodes.find(s =>
        NameNormalizer.normalize(streamName(s)) ==
          NameNormalizer.normalize(stream)))
      .getOrElse(throw new NoSuchElementException(s"Stream not found: $stream"))

  /** Discover output: the same catalog JSON shape the subprocess path
    * produces, so `ConfiguredCatalog.fromCatalogJson` (S2) is reused
    * verbatim — one catalog model for both connector kinds. */
  def discoverJson: String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("streams")
    streamNodes.foreach { s =>
      val out = arr.addObject()
      out.put("name", streamName(s))
      out.set[ObjectNode]("json_schema", streamSchema(s))
      val pks = primaryKeyOf(s)
      if (pks.nonEmpty) {
        val pkArr = out.putArray("source_defined_primary_key")
        pks.foreach(pk => pkArr.addArray().add(pk))
      }
      cursorFieldOf(s).foreach { c =>
        out.putArray("default_cursor_field").add(c)
      }
    }
    root.toString
  }

  override val catalog: ConfiguredCatalog =
    ConfiguredCatalog.fromCatalogJson(discoverJson)

  /** `check`: every `check.stream_names` stream must resolve and its
    * first slice must parse to records (reference CheckStream). Throws
    * with the failing detail, matching `SubprocessSource.check`. */
  def check(): Unit = {
    val names = Option(manifest.get("check")).toSeq
      .flatMap(c => Option(c.get("stream_names")).toSeq)
      .flatMap(_.elements().asScala).map(_.asText())
    val toCheck = if (names.nonEmpty) names else streamNodes.map(streamName)
    toCheck.foreach { s =>
      try {
        val urls = sliceUrls(s)
        if (urls.isEmpty)
          throw new graft.errors.ConnectorCheckFailedError(
            name, "failed", s"stream '$s' produced no slices to check")
        val (url, slice) = urls.head
        val body = readLocal(url, fixtureRoot)
        val _ = slice
        extractRecords(body, fieldPathOf(streamByName(s)))
        fileLogger.info(s"check succeeded for stream '$s'")
      } catch {
        case e: Exception =>
          fileLogger.error(s"check failed for stream '$s': ${e.getMessage}")
          throw e
      }
    }
  }

  /** Resolved (first-page url, stream_slice) pairs for a stream — the
    * cartesian product of partition-router values (List or Substream)
    * and datetime-cursor windows, or a single unsliced pair. Pure
    * manifest/metadata work, driver-side (substream parents read their
    * fixtures here — slice resolution is the declarative analog of
    * file listing). Pagination does NOT appear here: pages are walked
    * lazily per slice, executor-side. */
  def sliceUrls(stream: String): Seq[(String, Map[String, String])] = {
    val s = streamByName(stream)
    slicesFor(s).map(slice => (requestUrl(s, slice), slice))
  }

  private def retrieverOf(s: JsonNode): JsonNode =
    Option(s.get("retriever")).getOrElse(
      throw new graft.errors.ManifestError(
        s"stream '${streamName(s)}' has no retriever",
        Map("stream_name" -> streamName(s), "component" -> "retriever")))

  /** Request headers the manifest's `requester.authenticator` would
    * attach, resolved against config (CDK authenticator semantics):
    * ApiKeyAuthenticator (custom header via `header` or
    * `inject_into.field_name`), BearerAuthenticator
    * (`Authorization: Bearer <token>`), BasicHttpAuthenticator
    * (RFC 7617 base64 of `user:pass`). COMPUTED, never sent — the
    * no-egress analog of a recorded-request assertion: a spec (or a
    * replay harness) checks these against the fixture's expected
    * headers. `inject_into: request_parameter` and unknown types are
    * rejected loudly (params would change fixture URL resolution). */
  def requestHeaders(stream: String): Map[String, String] = {
    val s = streamByName(stream)
    val auth = Option(retrieverOf(s).get("requester"))
      .flatMap(r => Option(r.get("authenticator")))
    auth match {
      case None => Map.empty
      case Some(a) =>
        def field(n: String): String = Option(a.get(n)).map(x =>
          interpolate(x.asText(), hydratedConfig, Map.empty)).getOrElse(
          throw new graft.errors.ManifestError(
            s"authenticator missing required field '$n'",
            Map("component" -> "authenticator", "field" -> n)))
        Option(a.get("type")).map(_.asText()).getOrElse("") match {
          case "BearerAuthenticator" =>
            Map("Authorization" -> s"Bearer ${field("api_token")}")
          case "ApiKeyAuthenticator" =>
            val target = Option(a.get("inject_into"))
            target.flatMap(t => Option(t.get("inject_into")).map(_.asText()))
              .foreach { into =>
                if (into != "header") throw new graft.errors.ManifestError(
                  s"ApiKeyAuthenticator inject_into '$into' unsupported " +
                    "(only 'header'; parameters would change fixture URLs)",
                  Map("inject_into" -> into, "supported" -> "header"))
              }
            val headerName = Option(a.get("header")).map(_.asText())
              .orElse(target.flatMap(t =>
                Option(t.get("field_name")).map(_.asText())))
              .getOrElse("Authorization")
            Map(headerName -> field("api_token"))
          case "BasicHttpAuthenticator" =>
            val user = field("username")
            val pass = Option(a.get("password")).map(x =>
              interpolate(x.asText(), hydratedConfig, Map.empty)).getOrElse("")
            val enc = java.util.Base64.getEncoder
              .encodeToString(s"$user:$pass".getBytes("UTF-8"))
            Map("Authorization" -> s"Basic $enc")
          case other => throw new graft.errors.ManifestError(
            s"unsupported authenticator type '$other'",
            Map("component" -> "authenticator", "authenticator_type" -> other))
        }
    }
  }

  /** First-page request URL for one slice: url_base + path + declared
    * request_parameters (manifest order), all interpolated. */
  private def requestUrl(s: JsonNode, slice: Map[String, String]): String = {
    val requester = Option(retrieverOf(s).get("requester")).getOrElse(
      throw new graft.errors.ManifestError(
      s"stream '${streamName(s)}' has no requester",
      Map("stream_name" -> streamName(s), "component" -> "requester")))
    val urlBase = Option(requester.get("url_base")).map(_.asText()).getOrElse("")
    val path = Option(requester.get("path")).map(_.asText()).getOrElse("")
    val joined =
      if (urlBase.nonEmpty && path.nonEmpty)
        urlBase.stripSuffix("/") + "/" + path.stripPrefix("/")
      else urlBase + path
    val params = Option(requester.get("request_parameters")).toSeq
      .flatMap(_.properties().asScala)
      .map(e => s"${e.getKey}=${interpolate(e.getValue.asText(), hydratedConfig, slice)}")
    val base = interpolate(joined, hydratedConfig, slice)
    if (params.isEmpty) base
    else params.foldLeft(base)((u, kv) =>
      DeclarativeComponents.addParam(u, kv.takeWhile(_ != '='),
        kv.dropWhile(_ != '=').tail))
  }

  private def slicesFor(s: JsonNode): Seq[Map[String, String]] = {
    val routed: Seq[Map[String, String]] =
      Option(retrieverOf(s).get("partition_router")) match {
        case None => Seq(Map.empty)
        case Some(pr) =>
          Option(pr.get("type")).map(_.asText()).getOrElse("") match {
            case "ListPartitionRouter" =>
              val cursor = pr.get("cursor_field").asText()
              pr.get("values").elements().asScala.toSeq
                .map(v => Map(cursor -> v.asText()))
            case "SubstreamPartitionRouter" => substreamSlices(s, pr)
            case t => throw new UnsupportedOperationException(
              s"stream '${streamName(s)}': partition_router type '$t' not " +
                "supported (ListPartitionRouter, SubstreamPartitionRouter)")
          }
      }
    val windows = datetimeWindows(s)
    if (windows.isEmpty) routed
    else for (r <- routed; w <- windows) yield r ++ w
  }

  /** SubstreamPartitionRouter: one slice per parent record's
    * `parent_key` value (order of appearance, de-duplicated) — the
    * parent stream's own slices, pages, filter, and transforms all
    * apply while resolving it. */
  private def substreamSlices(s: JsonNode, pr: JsonNode): Seq[Map[String, String]] = {
    val configs = Option(pr.get("parent_stream_configs")).toSeq
      .flatMap(_.elements().asScala)
    if (configs.isEmpty) throw new graft.errors.ManifestError(
      s"stream '${streamName(s)}': SubstreamPartitionRouter needs parent_stream_configs",
      Map("stream_name" -> streamName(s), "component" -> "SubstreamPartitionRouter"))
    val mapperLocal = mapper
    configs.flatMap { c =>
      val parent = Option(c.get("stream")).getOrElse(
        throw new graft.errors.ManifestError("parent_stream_config needs stream",
        Map("component" -> "SubstreamPartitionRouter")))
      val parentKey = c.get("parent_key").asText()
      val field = c.get("partition_field").asText()
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      slicesFor(parent).foreach { pSlice =>
        DeclarativeComponents.walkPages(requestUrl(parent, pSlice), pSlice,
          DeclarativeComponents.parsePaginator(retrieverOf(parent)),
          fixtureRoot, pipelineFor(parent)).foreach { rec =>
          Option(mapperLocal.readTree(rec).get(parentKey))
            .filterNot(_.isNull).foreach(v => seen += v.asText())
        }
      }
      seen.toSeq.map(v => Map(field -> v))
    }
  }

  /** DatetimeBasedCursor windows: `[start, start+step-granularity]`
    * pairs exposed as `stream_slice['start_time'/'end_time']`. Only a
    * manifest that declares start/end AND step slices; a bare cursor
    * declaration (state filtering only) yields no windows. */
  private def datetimeWindows(s: JsonNode): Seq[Map[String, String]] = {
    val inc = Option(s.get("incremental_sync")).getOrElse(return Seq.empty)
    if (Option(inc.get("type")).map(_.asText()).getOrElse("") != "DatetimeBasedCursor")
      return Seq.empty
    val step = Option(inc.get("step")).map(_.asText()).getOrElse(return Seq.empty)
    def datetimeOf(key: String): Option[String] =
      Option(inc.get(key)).map {
        case o if o.isObject => o.get("datetime").asText()
        case t => t.asText()
      }.map(interpolate(_, hydratedConfig, Map.empty))
    val startS = datetimeOf("start_datetime").getOrElse(return Seq.empty)
    val endS = datetimeOf("end_datetime").getOrElse(return Seq.empty)
    val fmt = Option(inc.get("datetime_format")).map(_.asText())
      .getOrElse("%Y-%m-%d")
    val javaFmt = fmt match {
      case "%Y-%m-%d" => "yyyy-MM-dd"
      case "%Y-%m-%dT%H:%M:%S" => "yyyy-MM-dd'T'HH:mm:ss"
      case other => throw new UnsupportedOperationException(
        s"datetime_format '$other' not supported (%Y-%m-%d, %Y-%m-%dT%H:%M:%S)")
    }
    val dtf = java.time.format.DateTimeFormatter.ofPattern(javaFmt)
    val dateOnly = !fmt.contains("%H")
    def parse(v: String): java.time.LocalDateTime =
      if (dateOnly) java.time.LocalDate.parse(v, dtf).atStartOfDay()
      else java.time.LocalDateTime.parse(v, dtf)
    def fmtOut(d: java.time.LocalDateTime): String =
      if (dateOnly) d.toLocalDate.format(dtf) else d.format(dtf)
    val stepDays = java.time.Period.parse(step)
    if (stepDays.toTotalMonths != 0) throw new UnsupportedOperationException(
      s"step '$step' not supported (day/week periods only)")
    val gran = Option(inc.get("cursor_granularity")).map(_.asText())
      .getOrElse(if (dateOnly) "P1D" else "PT1S")
    val granAmount: java.time.temporal.TemporalAmount =
      if (gran.startsWith("PT")) java.time.Duration.parse(gran)
      else java.time.Period.parse(gran)
    val end = parse(endS)
    val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    var cur = parse(startS)
    while (!cur.isAfter(end) && out.size < 100000) {
      val next = cur.plusDays(stepDays.getDays.toLong)
      val winEnd = Seq(next.minus(granAmount), end).min(
        Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      out += Map("start_time" -> fmtOut(cur), "end_time" -> fmtOut(winEnd))
      cur = next
    }
    out.toSeq
  }

  private def pipelineFor(s: JsonNode): DeclarativeComponents.RecordPipeline = {
    val filterCond = Option(retrieverOf(s).get("record_selector"))
      .flatMap(rs => Option(rs.get("record_filter")))
      .map { rf =>
        Option(rf.get("condition")).map(_.asText()).getOrElse(
          throw new graft.errors.ManifestError("record_filter needs condition",
            Map("component" -> "record_filter")))
      }
    DeclarativeComponents.RecordPipeline(fieldPathOf(s), filterCond,
      DeclarativeComponents.parseTransforms(s), hydratedConfig)
  }

  private def fieldPathOf(s: JsonNode): Seq[String] =
    Option(s.get("retriever"))
      .flatMap(r => Option(r.get("record_selector")))
      .flatMap(rs => Option(rs.get("extractor")))
      .flatMap(e => Option(e.get("field_path")))
      .toSeq.flatMap(_.elements().asScala).map(_.asText())

  private def primaryKeyOf(s: JsonNode): Seq[String] =
    Option(s.get("primary_key")).toSeq.flatMap {
      case t if t.isTextual => Seq(t.asText())
      case a if a.isArray => a.elements().asScala.map(_.asText()).toSeq
      case _ => Seq.empty
    }

  private def cursorFieldOf(s: JsonNode): Option[String] =
    Option(s.get("incremental_sync"))
      .flatMap(i => Option(i.get("cursor_field"))).map(_.asText())

  private def streamSchema(s: JsonNode): ObjectNode = {
    val loader = Option(s.get("schema_loader")).getOrElse(
      throw new graft.errors.ManifestError(
        s"stream '${streamName(s)}' needs a schema_loader " +
          "(InlineSchemaLoader or JsonFileSchemaLoader)",
        Map("stream_name" -> streamName(s), "component" -> "schema_loader")))
    Option(loader.get("type")).map(_.asText()).getOrElse("") match {
      case "InlineSchemaLoader" =>
        loader.get("schema").deepCopy[ObjectNode]()
      case "JsonFileSchemaLoader" =>
        val p = interpolate(loader.get("file_path").asText(), hydratedConfig, Map.empty)
        mapper.readTree(readLocal(p, fixtureRoot)).deepCopy[ObjectNode]()
      case other =>
        throw new UnsupportedOperationException(
          s"schema_loader type '$other' not supported")
    }
  }

  /**
   * Incremental (cursor) sync — the manifest `incremental_sync`
   * contract (DatetimeBasedCursor's observable behavior) on the
   * engine's state backend: records at or below the saved per-stream
   * cursor are filtered out BEFORE landing, the surviving batch
   * appends, and the new high-water mark (max over saved + batch)
   * checkpoints into `_airbyte_state` (ST3) so the next sync resumes.
   * The cursor filter is a Spark predicate on the normalized frame —
   * comparison happens in the cursor column's own type. Streams
   * without a declared cursor fall back to the standard read path.
   */
  def syncIncremental(
      cache: graft.cache.SparkCache,
      spark: SparkSession,
      streams: Seq[String] = Seq.empty): ReadResult = {
    import org.apache.spark.sql.functions.{col, lit, max}
    import graft.protocol.WriteStrategy
    val selected = if (streams.isEmpty) catalog.streamNames else streams
    selected.foreach { s =>
      catalog(s).cursorField match {
        case None =>
          val normalized = graft.operators.Records
            .normalize(recordJsonl(spark, s), catalog(s).schema)
          cache.writeStream(s, normalized, catalog, WriteStrategy.Auto)
        case Some(cursor) =>
          val saved = cache.latestState(name, s).flatMap { js =>
            Option(mapper.readTree(js).get("cursor")).map(_.asText())
          }
          val normalized = graft.operators.Records
            .normalize(recordJsonl(spark, s), catalog(s).schema)
          val cursorType = normalized.schema(cursor).dataType
          val fresh = saved match {
            case Some(v) => normalized.filter(col(cursor) > lit(v).cast(cursorType))
            case None => normalized
          }
          cache.writeStream(s, fresh, catalog, WriteStrategy.Append)
          val hw = fresh.agg(max(col(cursor))).collect()(0)
          if (!hw.isNullAt(0)) {
            val node = mapper.createObjectNode()
            node.putArray("cursor_field").add(cursor)
            node.put("cursor", hw.get(0).toString)
            cache.writeState(name, s, node.toString)
          }
      }
    }
    new ReadResult(cache, selected)
  }

  /** Record payload JSONL for one stream: slices fan out one-per-partition
    * and each executor walks its own slice's pages (paginator), parses
    * response bodies, applies the record filter and transformations. The
    * driver only resolves slices — no page list or record ever
    * materializes there. */
  override def recordJsonl(spark: SparkSession, stream: String): Dataset[String] = {
    import spark.implicits._
    val urls = sliceUrls(stream)
    val node = streamByName(stream)
    val pipeline = pipelineFor(node)
    val paginator = DeclarativeComponents.parsePaginator(retrieverOf(node))
    val root = fixtureRoot
    fileLogger.info(s"reading stream '$stream' (${urls.size} slice(s))")
    if (urls.isEmpty) return spark.emptyDataset[String]
    spark.createDataset(urls.map { case (u, sl) => (u, sl.toSeq) })
      .repartition(urls.size)
      .mapPartitions { it =>
        it.flatMap { case (url, sl) =>
          DeclarativeComponents.walkPages(url, sl.toMap, paginator, root, pipeline)
        }
      }
  }
}

object DeclarativeSource {
  private val mapper = new ObjectMapper()
  private val yamlMapper = new YAMLMapper()

  def parseYaml(yaml: String): JsonNode = yamlMapper.readTree(yaml)

  /** Load a manifest file (YAML) into a source; fixture-relative paths
    * resolve against the manifest's own directory unless overridden. */
  def fromFile(name: String, manifestPath: String,
      config: Map[String, String] = Map.empty,
      fixtureRoot: Option[String] = None): DeclarativeSource = {
    val p = Paths.get(manifestPath)
    new DeclarativeSource(name,
      new String(Files.readAllBytes(p), "UTF-8"), config,
      fixtureRoot.orElse(Option(p.getParent).map(_.toString)))
  }

  /** Expand `$ref: "#/..."` pointers (CDK manifest convention): the
    * referenced node's fields merge under the referencing object, with
    * sibling keys overriding (CDK semantics). Iterates to a fixpoint
    * with a depth guard against cycles. */
  def resolveRefs(root: JsonNode): JsonNode = {
    var cur = root
    var depth = 0
    while (hasRef(cur) && depth < 16) { cur = expandOnce(cur, cur); depth += 1 }
    if (hasRef(cur))
      throw new graft.errors.ManifestError("manifest $ref depth/cycle exceeded",
        Map("component" -> "$ref"))
    cur
  }

  private def hasRef(n: JsonNode): Boolean = n match {
    case o if o.isObject =>
      o.has("$ref") || o.fields().asScala.exists(e => hasRef(e.getValue))
    case a if a.isArray => a.elements().asScala.exists(hasRef)
    case _ => false
  }

  private def expandOnce(n: JsonNode, root: JsonNode): JsonNode = n match {
    case o if o.isObject && o.has("$ref") =>
      val target = resolvePointer(root, o.get("$ref").asText()).deepCopy[JsonNode]()
      val siblings = o.fields().asScala.filterNot(_.getKey == "$ref").toSeq
      if (!target.isObject || siblings.isEmpty) target
      else {
        val merged = target.asInstanceOf[ObjectNode]
        siblings.foreach(e => merged.set[ObjectNode](e.getKey, e.getValue))
        merged
      }
    case o if o.isObject =>
      val out = mapper.createObjectNode()
      o.fields().asScala.foreach(e =>
        out.set[ObjectNode](e.getKey, expandOnce(e.getValue, root)))
      out
    case a if a.isArray =>
      val out = mapper.createArrayNode()
      a.elements().asScala.foreach(e => out.add(expandOnce(e, root)))
      out
    case other => other
  }

  private[sources] def resolvePointer(root: JsonNode, ref: String): JsonNode = {
    val parts = ref.stripPrefix("#").stripPrefix("/").split('/').filter(_.nonEmpty)
    parts.foldLeft(root) { (n, p) =>
      Option(n.get(p)).getOrElse(throw new graft.errors.ManifestError(
        s"manifest ref not found: $ref (missing '$p')",
        Map("ref" -> ref, "missing_segment" -> p)))
    }
  }

  /** `{{ config['k'] }}` / `{{ stream_slice['k'] }}` interpolation —
    * the two contexts fixture reads need. Unknown keys fail loudly. */
  private val interpPattern =
    """\{\{\s*(config|stream_slice)\[['"]([^'"\]]+)['"]\]\s*\}\}""".r

  def interpolate(template: String, config: Map[String, String],
      slice: Map[String, String]): String =
    interpPattern.replaceAllIn(template, m => {
      val ctx = if (m.group(1) == "config") config else slice
      java.util.regex.Matcher.quoteReplacement(
        ctx.getOrElse(m.group(2), throw new NoSuchElementException(
          s"interpolation key '${m.group(2)}' not in ${m.group(1)}")))
    })

  /** Resolve a requester URL to local bytes — the no-egress contract:
    * file:// and relative paths read directly; http(s) URLs map to
    * `<fixtureRoot>/<host>/<path>` recorded responses. */
  def readLocal(url: String, fixtureRoot: Option[String]): String = {
    val path =
      if (url.startsWith("file://")) url.stripPrefix("file://")
      else if (url.startsWith("http://") || url.startsWith("https://")) {
        val rest = url.replaceFirst("^https?://", "")
        val root = fixtureRoot.getOrElse(throw new graft.errors.GraftInputError(
          s"http(s) URL '$url' needs a fixtureRoot with recorded responses " +
            "(this interpreter has no network egress)",
          guidance = Some("Pass fixtureRoot pointing at a directory of " +
            "recorded responses laid out as <root>/<host>/<path>."),
          context = scala.collection.immutable.ListMap("url" -> url)))
        s"${root.stripSuffix("/")}/$rest"
      } else fixtureRoot match {
        case Some(root) if !url.startsWith("/") => s"${root.stripSuffix("/")}/$url"
        case _ => url
      }
    val p = Paths.get(path)
    val candidate =
      if (Files.isRegularFile(p)) p // not a dir: `users` may be both a
      else Paths.get(path + ".json") // fixture (`users.json`) and a subtree
    if (!Files.isRegularFile(candidate))
      throw new java.io.FileNotFoundException(
        s"fixture for '$url' not found at '$path'")
    new String(Files.readAllBytes(candidate), "UTF-8")
  }

  /** DpathExtractor: walk `field_path` into the response body (`*`
    * fans out over arrays / object values); the landing node yields its
    * elements when an array, itself when an object. Executor-side. */
  def extractRecords(body: String, fieldPath: Seq[String]): Seq[String] = {
    val rootNode = mapper.readTree(body)
    val landed = fieldPath.foldLeft(Seq(rootNode)) { (nodes, step) =>
      nodes.flatMap { n =>
        if (step == "*")
          (if (n.isArray) n.elements().asScala
           else if (n.isObject) n.properties().asScala.map(_.getValue)
           else Iterator.empty).toSeq
        else Option(n.get(step)).toSeq
      }
    }
    landed.flatMap { n =>
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    }.filter(_.isObject).map(_.toString)
  }

}
