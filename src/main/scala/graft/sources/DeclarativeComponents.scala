package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.errors.ManifestError
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * Serializable declarative-manifest components — the executor-side half
 * of the low-code interpreter. `DeclarativeSource` parses the manifest
 * ONCE on the driver into these plain case classes; record extraction,
 * filtering, transformation, and page-walking then run inside
 * `mapPartitions` with no Jackson tree of the manifest in the closure.
 *
 * Semantics follow the public Airbyte CDK declarative-component schema
 * (the same engine the reference wraps in
 * `airbyte/_executors/declarative.py:90-101` via
 * `ConcurrentDeclarativeSource`):
 *
 *  - `DefaultPaginator` with `PageIncrement` / `OffsetIncrement` /
 *    `CursorPagination` strategies. Page N of a slice is one more
 *    fixture file (`users?page=2.json`) — the page token rides the URL
 *    exactly as it would on the wire, so recorded API responses replay
 *    unmodified. Pagination is a PER-SLICE loop and runs executor-side:
 *    a 10k-slice stream walks its pages in parallel, one slice per
 *    partition, and no page list is ever materialized on the driver.
 *  - `RecordFilter.condition` — `{{ record['x'] > 5 }}`-style Jinja
 *    comparisons over record/config/stream_slice.
 *  - `AddFields` / `RemoveFields` transformations, applied per record
 *    after filtering (CDK order: filter, then transform).
 *
 * Stop conditions are structural (short page / missing cursor), so a
 * truncated fixture tree terminates cleanly rather than 404-ing.
 */
object DeclarativeComponents {

  // per-JVM, not serialized with closures (object members are static)
  private val mapper = new ObjectMapper()

  /** One pagination strategy, parsed driver-side from
    * `retriever.paginator` (type DefaultPaginator).
    *
    * @param kind           PageIncrement | OffsetIncrement | CursorPagination
    * @param pageSize       page_size (stop when a page extracts fewer)
    * @param startFromPage  PageIncrement start_from_page (CDK default 0)
    * @param injectOnFirst  inject_on_first_request: send the token on
    *                       page 1 too (default false — first URL is bare)
    * @param paramName      page_token_option request_parameter name; for
    *                       CursorPagination, absent means the cursor value
    *                       IS the next URL (`{{ response['next'] }}`)
    * @param cursorTemplate CursorPagination cursor_value template
    * @param stopOnMissing  derived from stop_condition: stop when the
    *                       cursor accessor is missing/null/false
    */
  final case class PaginatorSpec(
      kind: String,
      pageSize: Int,
      startFromPage: Int,
      injectOnFirst: Boolean,
      paramName: Option[String],
      cursorTemplate: Option[String],
      stopOnMissing: Boolean)

  /** AddFields (path+value template, optional value_type cast) or
    * RemoveFields (path only). Single-segment paths — the flat-record
    * shape every downstream schema projection expects. */
  final case class TransformOp(
      kind: String, // AddFields | RemoveFields
      field: String,
      valueTemplate: Option[String],
      valueType: Option[String])

  /** The executor-side record pipeline for one stream: dpath
    * extraction, record filter, transformations. Pure function of
    * (response body, stream_slice) — safe inside mapPartitions. */
  final case class RecordPipeline(
      fieldPath: Seq[String],
      filterCondition: Option[String],
      transforms: Seq[TransformOp],
      config: Map[String, String]) {

    /** (final record JSONs, extracted-count-before-filter, response root).
      * The pre-filter count drives page/offset stop conditions — the CDK
      * paginates on what the extractor yielded, not what survived the
      * filter. */
    def extract(body: String, slice: Map[String, String])
        : (Seq[String], Int, JsonNode) = {
      val root = mapper.readTree(body)
      val landed = fieldPath.foldLeft(Seq(root)) { (nodes, step) =>
        nodes.flatMap { n =>
          if (step == "*")
            (if (n.isArray) n.elements().asScala
             else if (n.isObject) n.properties().asScala.map(_.getValue)
             else Iterator.empty).toSeq
          else Option(n.get(step)).toSeq
        }
      }
      val objs = landed.flatMap { n =>
        if (n.isArray) n.elements().asScala.toSeq else Seq(n)
      }.filter(_.isObject)
      val kept = filterCondition match {
        case Some(c) => objs.filter(n => ConditionEval.eval(c, config, slice, n))
        case None => objs
      }
      (kept.map(applyTransforms(_, slice)), objs.size, root)
    }

    private def applyTransforms(rec: JsonNode, slice: Map[String, String]): String = {
      if (transforms.isEmpty) return rec.toString
      val obj = rec.deepCopy[JsonNode]().asInstanceOf[ObjectNode]
      transforms.foreach {
        case TransformOp("RemoveFields", f, _, _) => obj.remove(f): Unit
        case TransformOp("AddFields", f, Some(tpl), vt) =>
          TemplateEval.eval(tpl, config, slice, record = Some(obj)) match {
            case None => obj.putNull(f): Unit
            case Some(v) => vt.getOrElse("string") match {
              case "integer" => obj.put(f, v.toLong): Unit
              case "number"  => obj.put(f, v.toDouble): Unit
              case "boolean" => obj.put(f, v.toBoolean): Unit
              case _         => obj.put(f, v): Unit
            }
          }
        case t => throw new UnsupportedOperationException(s"transform $t")
      }
      obj.toString
    }
  }

  /** Walk all pages of one slice, returning the final record JSONs.
    * Runs executor-side from `recordJsonl` (and driver-side when
    * resolving substream parents). The guard bounds a manifest whose
    * stop condition never fires against a cyclic fixture. */
  def walkPages(
      firstUrl: String,
      slice: Map[String, String],
      paginator: Option[PaginatorSpec],
      fixtureRoot: Option[String],
      pipeline: RecordPipeline): Seq[String] = paginator match {
    case None =>
      pipeline.extract(DeclarativeSource.readLocal(firstUrl, fixtureRoot), slice)._1
    case Some(p) =>
      val out = ArrayBuffer.empty[String]
      var url =
        if (p.injectOnFirst && p.paramName.isDefined)
          addParam(firstUrl, p.paramName.get, firstToken(p))
        else firstUrl
      var page = p.startFromPage
      var offset = 0
      var lastRecord: Option[JsonNode] = None
      var continue = true
      var guard = 0
      while (continue && guard < 100000) {
        guard += 1
        val (recs, rawCount, respRoot) =
          pipeline.extract(DeclarativeSource.readLocal(url, fixtureRoot), slice)
        out ++= recs
        if (recs.nonEmpty) lastRecord = Some(mapper.readTree(recs.last))
        p.kind match {
          case "PageIncrement" =>
            if (rawCount < p.pageSize) continue = false
            else { page += 1; url = addParam(firstUrl, p.paramName.get, page.toString) }
          case "OffsetIncrement" =>
            offset += rawCount
            if (rawCount < p.pageSize) continue = false
            else url = addParam(firstUrl, p.paramName.get, offset.toString)
          case "CursorPagination" =>
            val token = TemplateEval.eval(p.cursorTemplate.get, pipeline.config,
              slice, response = Some(respRoot), lastRecord = lastRecord)
            token.filter(_.nonEmpty) match {
              case None => continue = false // stop: cursor missing/null
              case Some(t) =>
                url = p.paramName match {
                  case Some(param) => addParam(firstUrl, param, t)
                  case None => t // cursor value IS the next URL
                }
            }
          case other =>
            throw new UnsupportedOperationException(s"pagination strategy '$other'")
        }
      }
      out.toSeq
  }

  private def firstToken(p: PaginatorSpec): String = p.kind match {
    case "OffsetIncrement" => "0"
    case _ => p.startFromPage.toString
  }

  private[sources] def addParam(url: String, name: String, value: String): String = {
    val sep = if (url.contains("?")) "&" else "?"
    s"$url$sep$name=$value"
  }

  /** Parse `retriever.paginator` (driver-side). `NoPagination` and an
    * absent node both mean single-page; anything else must be a
    * DefaultPaginator with a supported strategy — unknown shapes fail
    * loudly at parse time, never silently at read time. */
  def parsePaginator(retriever: JsonNode): Option[PaginatorSpec] = {
    val pag = Option(retriever.get("paginator")).getOrElse(return None)
    Option(pag.get("type")).map(_.asText()).getOrElse("") match {
      case "NoPagination" => return None
      case "DefaultPaginator" => ()
      case other => throw new UnsupportedOperationException(
        s"paginator type '$other' not supported (DefaultPaginator, NoPagination)")
    }
    val strat = Option(pag.get("pagination_strategy")).getOrElse(
      throw new ManifestError("DefaultPaginator needs pagination_strategy",
        Map("component" -> "DefaultPaginator")))
    val kind = Option(strat.get("type")).map(_.asText()).getOrElse("")
    val paramName = Option(pag.get("page_token_option"))
      .flatMap { opt =>
        Option(opt.get("inject_into")).map(_.asText()).getOrElse("request_parameter") match {
          case "request_parameter" => ()
          case other => throw new UnsupportedOperationException(
            s"page_token_option inject_into '$other' not supported (request_parameter)")
        }
        Option(opt.get("field_name")).map(_.asText())
      }
    val pageSize = Option(strat.get("page_size")).map(_.asInt()).getOrElse(
      kind match {
        case "CursorPagination" => Int.MaxValue // cursor decides, not size
        case _ => throw new ManifestError(s"$kind needs page_size",
          Map("component" -> kind, "field" -> "page_size"))
      })
    kind match {
      case "PageIncrement" | "OffsetIncrement" =>
        if (paramName.isEmpty) throw new ManifestError(
          s"$kind needs page_token_option.field_name (request_parameter)",
          Map("component" -> kind, "field" -> "page_token_option.field_name"))
        Some(PaginatorSpec(kind, pageSize,
          Option(strat.get("start_from_page")).map(_.asInt()).getOrElse(0),
          Option(strat.get("inject_on_first_request")).exists(_.asBoolean()),
          paramName, None, stopOnMissing = false))
      case "CursorPagination" =>
        val tpl = Option(strat.get("cursor_value")).map(_.asText()).getOrElse(
          throw new ManifestError("CursorPagination needs cursor_value",
            Map("component" -> "CursorPagination", "field" -> "cursor_value")))
        // stop_condition, when present, must be the standard
        // "cursor absent" shape — our walk already stops on a missing
        // cursor, so we only validate that the manifest means the same.
        Option(strat.get("stop_condition")).map(_.asText()).foreach { sc =>
          val ok = sc.matches("""\{\{\s*(not\s+.+|.+\s+is\s+none)\s*\}\}""")
          if (!ok) throw new UnsupportedOperationException(
            s"stop_condition '$sc' not supported (use '{{ not <accessor> }}' " +
              "or '{{ <accessor> is none }}')")
        }
        Some(PaginatorSpec("CursorPagination", pageSize, 0,
          injectOnFirst = false, paramName, Some(tpl), stopOnMissing = true))
      case other =>
        throw new UnsupportedOperationException(s"pagination strategy '$other'")
    }
  }

  /** Parse `transformations` (driver-side): AddFields field/value pairs
    * and RemoveFields pointers, single-segment paths only. */
  def parseTransforms(stream: JsonNode): Seq[TransformOp] =
    Option(stream.get("transformations")).toSeq
      .flatMap(_.elements().asScala).flatMap { t =>
        Option(t.get("type")).map(_.asText()).getOrElse("") match {
          case "AddFields" =>
            Option(t.get("fields")).toSeq.flatMap(_.elements().asScala).map { f =>
              val path = Option(f.get("path")).toSeq
                .flatMap(_.elements().asScala).map(_.asText())
              if (path.size != 1) throw new UnsupportedOperationException(
                s"AddFields nested path ${path.mkString("/")} not supported")
              TransformOp("AddFields", path.head,
                Some(Option(f.get("value")).map(_.asText()).getOrElse(
                  throw new ManifestError("AddFields needs value",
                    Map("component" -> "AddFields")))),
                Option(f.get("value_type")).map(_.asText()))
            }
          case "RemoveFields" =>
            Option(t.get("field_pointers")).toSeq
              .flatMap(_.elements().asScala).map { ptr =>
                val path = ptr.elements().asScala.map(_.asText()).toSeq
                if (path.size != 1) throw new UnsupportedOperationException(
                  s"RemoveFields nested pointer ${path.mkString("/")} not supported")
                TransformOp("RemoveFields", path.head, None, None)
              }
          case other => throw new UnsupportedOperationException(
            s"transformation type '$other' not supported (AddFields, RemoveFields)")
        }
      }
}

/** `{{ ... }}` template evaluation over the declarative interpolation
  * contexts: config, stream_slice, record, response, last_record.
  * Bracket paths chain (`response['meta']['next']`). Unknown context
  * keys in config/stream_slice fail loudly (a manifest typo should not
  * silently read an empty string); record/response lookups yield None
  * for missing fields (absent JSON is data, not a typo). */
object TemplateEval {
  private val accessor =
    """(config|stream_slice|record|response|last_record)((?:\[['"][^'"\]]+['"]\])+)""".r
  private val segment = """\[['"]([^'"\]]+)['"]\]""".r
  private val wholeTemplate = """^\s*\{\{\s*(.*?)\s*\}\}\s*$""".r

  /** Evaluate a full `{{ expr }}` template (or literal text with
    * embedded accessors). Returns None when a JSON accessor lands on
    * missing/null. */
  def eval(template: String, config: Map[String, String],
      slice: Map[String, String], record: Option[JsonNode] = None,
      response: Option[JsonNode] = None,
      lastRecord: Option[JsonNode] = None): Option[String] = template match {
    case wholeTemplate(expr) =>
      resolveOperand(expr.trim, config, slice, record, response, lastRecord)
        .map(jsonText)
    case other => // literal with embedded {{ accessors }} — interpolate all
      var missing = false
      val out = """\{\{\s*(.*?)\s*\}\}""".r.replaceAllIn(other, m => {
        resolveOperand(m.group(1).trim, config, slice, record, response, lastRecord) match {
          case Some(v) => java.util.regex.Matcher.quoteReplacement(jsonText(v))
          case None => missing = true; ""
        }
      })
      if (missing) None else Some(out)
  }

  /** Resolve one operand: an accessor, a quoted string, a number, or a
    * boolean literal. Returns the value as Any (JsonNode | String). */
  private[sources] def resolveOperand(expr: String,
      config: Map[String, String], slice: Map[String, String],
      record: Option[JsonNode], response: Option[JsonNode],
      lastRecord: Option[JsonNode]): Option[Any] = expr match {
    case accessor(ctx, path) =>
      val keys = segment.findAllMatchIn(path).map(_.group(1)).toSeq
      ctx match {
        case "config" => Some(lookupMap(config, keys, "config"))
        case "stream_slice" => Some(lookupMap(slice, keys, "stream_slice"))
        case "record" => walk(record, keys)
        case "response" => walk(response, keys)
        case "last_record" => walk(lastRecord, keys)
        case other => throw new ManifestError(
          s"unknown template context '$other'",
          Map("component" -> "template", "template_context" -> other))
      }
    case s if s.length >= 2 &&
        ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')) =>
      Some(s.substring(1, s.length - 1))
    case "true" => Some(true)
    case "false" => Some(false)
    case n if n.matches("""-?\d+(\.\d+)?""") => Some(n)
    case other => throw new UnsupportedOperationException(
      s"template expression '$other' not supported")
  }

  private def lookupMap(m: Map[String, String], keys: Seq[String],
      what: String): String = {
    if (keys.size != 1) throw new UnsupportedOperationException(
      s"$what nested access ${keys.mkString("/")} not supported")
    m.getOrElse(keys.head, throw new NoSuchElementException(
      s"interpolation key '${keys.head}' not in $what"))
  }

  private def walk(node: Option[JsonNode], keys: Seq[String]): Option[JsonNode] =
    keys.foldLeft(node) { (n, k) => n.flatMap(x => Option(x.get(k))) }
      .filterNot(_.isNull)

  private[sources] def jsonText(v: Any): String = v match {
    case n: JsonNode => if (n.isValueNode) n.asText() else n.toString
    case other => other.toString
  }
}

/** Record-filter condition evaluation: `{{ a <op> b }}`, `{{ not a }}`,
  * or bare-accessor truthiness, over the same contexts as TemplateEval.
  * Numeric comparison when both sides parse as numbers, else string —
  * the observable behavior of the CDK's Jinja comparisons for flat
  * scalar records. */
object ConditionEval {
  private val wholeTemplate = """^\s*\{\{\s*(.*?)\s*\}\}\s*$""".r
  private val cmp = """(.+?)\s*(==|!=|>=|<=|>|<)\s*(.+)""".r

  def eval(condition: String, config: Map[String, String],
      slice: Map[String, String], record: JsonNode): Boolean = {
    val expr = condition match {
      case wholeTemplate(e) => e.trim
      case other => throw new ManifestError(
        s"record filter condition must be a '{{ ... }}' template: $other",
        Map("component" -> "record_filter"))
    }
    expr match {
      case cmp(l, op, r) =>
        val lv = TemplateEval.resolveOperand(l.trim, config, slice,
          Some(record), None, None)
        val rv = TemplateEval.resolveOperand(r.trim, config, slice,
          Some(record), None, None)
        (lv, rv) match {
          case (Some(a), Some(b)) => compare(a, b, op)
          case _ => false // null fails every comparison (SQL-like)
        }
      case not if not.startsWith("not ") =>
        !truthy(TemplateEval.resolveOperand(not.stripPrefix("not ").trim,
          config, slice, Some(record), None, None))
      case bare =>
        truthy(TemplateEval.resolveOperand(bare, config, slice,
          Some(record), None, None))
    }
  }

  private def truthy(v: Option[Any]): Boolean = v match {
    case None => false
    case Some(b: Boolean) => b
    case Some(n: JsonNode) =>
      if (n.isBoolean) n.asBoolean()
      else if (n.isNumber) n.asDouble() != 0.0
      else if (n.isTextual) n.asText().nonEmpty
      else true
    case Some(s: String) => s.nonEmpty && s != "false"
  }

  private def compare(a: Any, b: Any, op: String): Boolean = {
    val (as, bs) = (TemplateEval.jsonText(a), TemplateEval.jsonText(b))
    val c: Int = (numeric(a, as), numeric(b, bs)) match {
      case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
      case _ => as.compareTo(bs)
    }
    op match {
      case "==" => c == 0
      case "!=" => c != 0
      case ">=" => c >= 0
      case "<=" => c <= 0
      case ">" => c > 0
      case "<" => c < 0
      case other => throw new ManifestError(
        s"record_filter comparison operator '$other' unsupported",
        Map("operator" -> other,
          "supported" -> "== != >= <= > <"))
    }
  }

  private def numeric(v: Any, s: String): Option[Double] = v match {
    case n: JsonNode if n.isNumber => Some(n.asDouble())
    case n: JsonNode if n.isTextual => None // typed text stays text
    case _ => if (s.matches("""-?\d+(\.\d+)?""")) Some(s.toDouble) else None
  }
}
