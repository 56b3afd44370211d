package graft

import java.nio.file.{Files, Paths}

import graft.cache.SparkCache
import graft.protocol.WriteStrategy
import graft.sources.DeclarativeSource

/** Declarative (YAML manifest) source: $ref resolution, interpolation,
  * spec/discover/check, fixture-backed read through the standard cache
  * path — the reference's `source_manifest=` surface
  * (`airbyte/_executors/declarative.py`, `airbyte/sources/util.py:107`)
  * without network egress. */
class DeclarativeSourceSpec extends SparkTestBase {

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  /** A realistic CDK-shaped manifest: definitions + $ref, an https
    * url_base (mapped to recorded fixtures), config interpolation,
    * inline schemas, primary keys, a partition-routed stream. */
  private def manifest: String =
    """version: "0.29.0"
      |type: DeclarativeSource
      |definitions:
      |  requester:
      |    type: HttpRequester
      |    url_base: "https://api.example.com/v1"
      |  users_stream:
      |    type: DeclarativeStream
      |    name: users
      |    primary_key: ["id"]
      |    schema_loader:
      |      type: InlineSchemaLoader
      |      schema:
      |        type: object
      |        properties:
      |          id: {type: integer}
      |          name: {type: string}
      |          plan: {type: string}
      |    retriever:
      |      type: SimpleRetriever
      |      requester:
      |        $ref: "#/definitions/requester"
      |        path: "/{{ config['tenant'] }}/users"
      |      record_selector:
      |        type: RecordSelector
      |        extractor:
      |          type: DpathExtractor
      |          field_path: ["data", "results"]
      |check:
      |  type: CheckStream
      |  stream_names: ["users"]
      |spec:
      |  type: Spec
      |  connection_specification:
      |    type: object
      |    required: ["tenant"]
      |    properties:
      |      tenant: {type: string}
      |streams:
      |  - $ref: "#/definitions/users_stream"
      |  - type: DeclarativeStream
      |    name: orders
      |    primary_key: ["order_id"]
      |    schema_loader:
      |      type: InlineSchemaLoader
      |      schema:
      |        type: object
      |        properties:
      |          order_id: {type: integer}
      |          user_id: {type: integer}
      |          amount: {type: number}
      |          region: {type: string}
      |    retriever:
      |      type: SimpleRetriever
      |      requester:
      |        $ref: "#/definitions/requester"
      |        path: "/{{ config['tenant'] }}/orders/{{ stream_slice['region'] }}"
      |      record_selector:
      |        type: RecordSelector
      |        extractor:
      |          type: DpathExtractor
      |          field_path: ["orders"]
      |      partition_router:
      |        type: ListPartitionRouter
      |        cursor_field: region
      |        values: ["emea", "apac"]
      |""".stripMargin

  private def stageFixtures(root: String): Unit = {
    write(s"$root/api.example.com/v1/acme/users.json",
      """{"data":{"results":[
        |  {"id":1,"name":"ann","plan":"pro"},
        |  {"id":2,"name":"bo","plan":"free"},
        |  {"id":3,"name":"cy","plan":"pro"}]}}""".stripMargin)
    write(s"$root/api.example.com/v1/acme/orders/emea.json",
      """{"orders":[{"order_id":10,"user_id":1,"amount":9.5,"region":"emea"},
        |           {"order_id":11,"user_id":2,"amount":3.25,"region":"emea"}]}""".stripMargin)
    write(s"$root/api.example.com/v1/acme/orders/apac.json",
      """{"orders":[{"order_id":12,"user_id":3,"amount":7.0,"region":"apac"}]}""".stripMargin)
  }

  private def newSource(root: String): DeclarativeSource = {
    stageFixtures(root)
    new DeclarativeSource("source-example", manifest,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
  }

  test("spec, discover, and check run from the manifest alone") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    assert(src.version.contains("0.29.0"))
    assert(src.specJson.get.contains("\"tenant\""))
    // discover → the shared ConfiguredCatalog model (S2 path reuse)
    assert(src.catalog.streamNames == Seq("users", "orders"))
    assert(src.catalog.primaryKeys("users") == Seq("id"))
    assert(src.catalog("orders").schema.fieldNames.toSeq ==
      Seq("order_id", "user_id", "amount", "region"))
    src.check() // passes: fixtures exist and parse
    val broken = new DeclarativeSource("broken", manifest,
      config = Map("tenant" -> "nosuch"), fixtureRoot = Some(root))
    val e = intercept[java.io.FileNotFoundException](broken.check())
    assert(e.getMessage.contains("nosuch"))
  }

  test("sync writes the connector's log file (info + error paths, structured toggle)") {
    import graft.logs.Logs
    import scala.jdk.CollectionConverters._
    val logroot = Files.createTempDirectory("graft-decl-logs").toString
    val prev = Logs.envReader
    Logs.envReader = {
      case Logs.EnvLoggingRoot => Some(logroot)
      case _ => None
    }
    try {
      val root = Files.createTempDirectory("graft-decl").toString
      val src = newSource(root)
      val cache = SparkCache.fresh(spark, "graft_test_decl_logs")
      src.check()
      src.read(cache, spark)
      val files = Files.list(Paths.get(logroot, "source-example"))
        .iterator().asScala.toSeq
      assert(files.size == 1)
      val all = Files.readAllLines(files.head).asScala.toSeq
      assert(all.exists(_.contains("- INFO - check succeeded for stream 'users'")))
      assert(all.exists(_.contains("- INFO - reading stream 'users' (1 slice(s))")))
      assert(all.exists(_.contains("- INFO - reading stream 'orders' (2 slice(s))")))
      // error path: a failing check lands at error in ITS OWN file
      val broken = new DeclarativeSource("source-broken", manifest,
        config = Map("tenant" -> "nosuch"), fixtureRoot = Some(root))
      intercept[java.io.FileNotFoundException](broken.check())
      val bFiles = Files.list(Paths.get(logroot, "source-broken"))
        .iterator().asScala.toSeq
      assert(Files.readAllLines(bFiles.head).asScala
        .exists(l => l.contains("- ERROR - check failed for stream 'users'")))
      cache.dropAll()
    } finally Logs.envReader = prev

    // structured toggle: the same check logs JSON lines
    val prev2 = Logs.envReader
    val logroot2 = Files.createTempDirectory("graft-decl-logs2").toString
    Logs.envReader = {
      case Logs.EnvLoggingRoot => Some(logroot2)
      case Logs.EnvStructuredLogging => Some("1")
      case _ => None
    }
    try {
      val root = Files.createTempDirectory("graft-decl").toString
      newSource(root).check()
      val files = Files.list(Paths.get(logroot2, "source-example"))
        .iterator().asScala.toSeq
      val line = Files.readAllLines(files.head).asScala
        .find(_.contains("check succeeded")).getOrElse(fail("no structured line"))
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      assert(n.get("level").asText() == "info" && n.hasNonNull("timestamp"))
    } finally Logs.envReader = prev2
  }

  test("read lands fixture records in the cache via the standard path") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    val cache = SparkCache.fresh(spark, "graft_test_decl")
    val result = src.read(cache, spark)
    assert(result.counts == Map("users" -> 3L, "orders" -> 3L))
    val users = cache.table("users")
    // declared schema projected + metadata columns added
    assert(users.columns.contains("_airbyte_raw_id") &&
      users.columns.contains("_airbyte_extracted_at"))
    assert(users.select("id", "name", "plan").collect().map(_.toSeq).toSet ==
      Set(Seq(1L, "ann", "pro"), Seq(2L, "bo", "free"), Seq(3L, "cy", "pro")))
    // partition-routed stream: records from BOTH slices arrive
    val regions = cache.table("orders").select("region")
      .collect().map(_.getString(0)).toSet
    assert(regions == Set("emea", "apac"))
    // PK declared → AUTO resolves to merge: a second read stays 3 rows
    val again = src.read(cache, spark, writeStrategy = WriteStrategy.Auto)
    assert(again.counts("users") == 3L)
  }

  test("config passed by secret_reference:: hydrates before interpolation and syncs") {
    import graft.sources.Secrets
    val root = Files.createTempDirectory("graft-decl").toString
    stageFixtures(root)
    Secrets.resetSecretSources()
    try {
      // the config value is a reference, not the tenant name — the
      // source must hydrate it before {{ config['tenant'] }} resolves.
      // Hydration is LATE-BOUND (the reference hydrates when the config
      // is used, _connector_base.py:128): the source is constructed
      // BEFORE its secret manager registers, and still resolves.
      val src = new DeclarativeSource("source-secret", manifest,
        config = Map("tenant" -> "secret_reference::TENANT_NAME"),
        fixtureRoot = Some(root))
      Secrets.registerSecretManager(
        new Secrets.EnvVarSecretManager(Map("TENANT_NAME" -> "acme")))
      src.check()
      val cache = SparkCache.fresh(spark, "graft_test_decl_secret")
      val result = src.read(cache, spark, streams = Seq("users"))
      assert(result.counts("users") == 3L)
      // an unresolvable reference constructs fine but fails at first
      // use (the connector boundary), naming the secret
      val bad = new DeclarativeSource("bad", manifest,
        config = Map("tenant" -> "secret_reference::NO_SUCH"),
        fixtureRoot = Some(root))
      val missing = intercept[Secrets.SecretNotFoundException](bad.check())
      assert(missing.secretName == "NO_SUCH")
    } finally Secrets.resetSecretSources()
  }

  test("slices parallelize one-per-partition (executor-side extraction)") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    assert(src.sliceUrls("orders").size == 2)
    assert(src.recordJsonl(spark, "orders").rdd.getNumPartitions == 2)
  }

  test("unsupported manifest features fail loudly, not silently") {
    val root = Files.createTempDirectory("graft-decl").toString
    stageFixtures(root)
    // unknown partition_router type
    val withRouter = manifest.replace("type: ListPartitionRouter",
      "type: GroupByKeyRouter")
    val src = new DeclarativeSource("t", withRouter,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    intercept[UnsupportedOperationException](src.sliceUrls("orders"))
    // unknown transformation type
    val withTransform = manifest.replace(
      "    retriever:\n      type: SimpleRetriever\n      requester:\n        $ref: \"#/definitions/requester\"\n        path: \"/{{ config['tenant'] }}/orders/{{ stream_slice['region'] }}\"",
      "    transformations:\n      - type: CustomTransformation\n    retriever:\n      type: SimpleRetriever\n      requester:\n        $ref: \"#/definitions/requester\"\n        path: \"/{{ config['tenant'] }}/orders/{{ stream_slice['region'] }}\"")
    val src2 = new DeclarativeSource("t2", withTransform,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    intercept[UnsupportedOperationException](src2.recordJsonl(spark, "orders"))
    // http(s) without a fixture root is an explicit no-egress error
    // (raised executor-side, so Spark may wrap it — check the chain)
    val noRoot = new DeclarativeSource("n", manifest,
      config = Map("tenant" -> "acme"), fixtureRoot = None)
    val e = intercept[Exception](noRoot.recordJsonl(spark, "users").collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("egress"), msgs)
  }

  // ---- phase-2 component surface: pagination, filter, transforms, ----
  // ---- substream router, datetime windows, request_parameters      ----

  /** Page-incremented stream: fixture file per page, CDK default
    * start_from_page=0 and no token on the first request. */
  test("DefaultPaginator/PageIncrement walks fixture pages until a short page") {
    val root = Files.createTempDirectory("graft-decl-pag").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: items
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          id: {type: integer}
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/items"
        |      record_selector:
        |        type: RecordSelector
        |        extractor:
        |          type: DpathExtractor
        |          field_path: ["items"]
        |      paginator:
        |        type: DefaultPaginator
        |        page_token_option:
        |          type: RequestOption
        |          inject_into: request_parameter
        |          field_name: page
        |        pagination_strategy:
        |          type: PageIncrement
        |          page_size: 2
        |""".stripMargin
    write(s"$root/api.example.com/items.json",
      """{"items":[{"id":1},{"id":2}]}""")
    write(s"$root/api.example.com/items?page=1.json",
      """{"items":[{"id":3},{"id":4}]}""")
    write(s"$root/api.example.com/items?page=2.json",
      """{"items":[{"id":5}]}""") // short page → stop
    val src = new DeclarativeSource("s", m, fixtureRoot = Some(root))
    val ids = src.recordJsonl(spark, "items").collect()
      .map(j => j.replaceAll("[^0-9]", "").toInt).sorted
    assert(ids.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("DefaultPaginator/OffsetIncrement injects the record offset") {
    val root = Files.createTempDirectory("graft-decl-off").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: rows
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema: {type: object, properties: {id: {type: integer}}}
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/rows"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["rows"]}
        |      paginator:
        |        type: DefaultPaginator
        |        page_token_option:
        |          type: RequestOption
        |          inject_into: request_parameter
        |          field_name: offset
        |        pagination_strategy:
        |          type: OffsetIncrement
        |          page_size: 3
        |""".stripMargin
    write(s"$root/api.example.com/rows.json",
      """{"rows":[{"id":1},{"id":2},{"id":3}]}""")
    write(s"$root/api.example.com/rows?offset=3.json",
      """{"rows":[{"id":4}]}""")
    val src = new DeclarativeSource("s", m, fixtureRoot = Some(root))
    assert(src.recordJsonl(spark, "rows").count() == 4)
  }

  test("DefaultPaginator/CursorPagination follows response['next'] as the next URL") {
    val root = Files.createTempDirectory("graft-decl-cur").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: feed
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema: {type: object, properties: {id: {type: integer}}}
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/feed"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["data"]}
        |      paginator:
        |        type: DefaultPaginator
        |        pagination_strategy:
        |          type: CursorPagination
        |          cursor_value: "{{ response['next'] }}"
        |          stop_condition: "{{ response['next'] is none }}"
        |""".stripMargin
    write(s"$root/api.example.com/feed.json",
      """{"data":[{"id":1}],"next":"https://api.example.com/feed2"}""")
    write(s"$root/api.example.com/feed2.json",
      """{"data":[{"id":2}]}""") // no next → stop
    val src = new DeclarativeSource("s", m, fixtureRoot = Some(root))
    assert(src.recordJsonl(spark, "feed").count() == 2)
  }

  test("record_filter condition drops records; transformations add/remove fields") {
    val root = Files.createTempDirectory("graft-decl-ft").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: users
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          id: {type: integer}
        |          plan: {type: string}
        |          tenant: {type: string}
        |    transformations:
        |      - type: AddFields
        |        fields:
        |          - path: ["tenant"]
        |            value: "{{ config['tenant'] }}"
        |      - type: RemoveFields
        |        field_pointers: [["secret"]]
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/users"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["users"]}
        |        record_filter:
        |          type: RecordFilter
        |          condition: "{{ record['plan'] == 'pro' }}"
        |""".stripMargin
    write(s"$root/api.example.com/users.json",
      """{"users":[
        |  {"id":1,"plan":"pro","secret":"x"},
        |  {"id":2,"plan":"free","secret":"y"},
        |  {"id":3,"plan":"pro","secret":"z"}]}""".stripMargin)
    val src = new DeclarativeSource("s", m,
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    val recs = src.recordJsonl(spark, "users").collect().sorted
    assert(recs.length == 2) // free filtered out
    assert(recs.forall(_.contains("\"tenant\":\"acme\"")))
    assert(!recs.exists(_.contains("secret")))
    // through the full cache path the declared schema keeps the added field
    val cache = graft.cache.SparkCache.fresh(spark, "graft_test_decl_ft")
    src.read(cache, spark)
    assert(cache.table("users").select("tenant").collect()
      .forall(_.getString(0) == "acme"))
    cache.dropAll()
  }

  test("SubstreamPartitionRouter slices a child per parent record") {
    val root = Files.createTempDirectory("graft-decl-sub").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |definitions:
        |  users_stream:
        |    type: DeclarativeStream
        |    name: users
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema: {type: object, properties: {id: {type: integer}}}
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/users"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["users"]}
        |streams:
        |  - $ref: "#/definitions/users_stream"
        |  - type: DeclarativeStream
        |    name: posts
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          post_id: {type: integer}
        |          user_id: {type: integer}
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/users/{{ stream_slice['user_id'] }}/posts"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["posts"]}
        |      partition_router:
        |        type: SubstreamPartitionRouter
        |        parent_stream_configs:
        |          - type: ParentStreamConfig
        |            stream:
        |              $ref: "#/definitions/users_stream"
        |            parent_key: id
        |            partition_field: user_id
        |""".stripMargin
    write(s"$root/api.example.com/users.json",
      """{"users":[{"id":7},{"id":9}]}""")
    write(s"$root/api.example.com/users/7/posts.json",
      """{"posts":[{"post_id":70,"user_id":7},{"post_id":71,"user_id":7}]}""")
    write(s"$root/api.example.com/users/9/posts.json",
      """{"posts":[{"post_id":90,"user_id":9}]}""")
    val src = new DeclarativeSource("s", m, fixtureRoot = Some(root))
    assert(src.sliceUrls("posts").map(_._2) ==
      Seq(Map("user_id" -> "7"), Map("user_id" -> "9")))
    assert(src.recordJsonl(spark, "posts").count() == 3)
  }

  test("DatetimeBasedCursor start/end/step slices windows into request_parameters") {
    val root = Files.createTempDirectory("graft-decl-dt").toString
    val m =
      """version: "1.0.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: events
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          id: {type: integer}
        |          day: {type: string}
        |    incremental_sync:
        |      type: DatetimeBasedCursor
        |      cursor_field: day
        |      start_datetime: "{{ config['start'] }}"
        |      end_datetime: "2024-01-04"
        |      step: P2D
        |      cursor_granularity: P1D
        |      datetime_format: "%Y-%m-%d"
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com"
        |        path: "/events"
        |        request_parameters:
        |          since: "{{ stream_slice['start_time'] }}"
        |          until: "{{ stream_slice['end_time'] }}"
        |      record_selector:
        |        type: RecordSelector
        |        extractor: {type: DpathExtractor, field_path: ["events"]}
        |""".stripMargin
    write(s"$root/api.example.com/events?since=2024-01-01&until=2024-01-02.json",
      """{"events":[{"id":1,"day":"2024-01-01"},{"id":2,"day":"2024-01-02"}]}""")
    write(s"$root/api.example.com/events?since=2024-01-03&until=2024-01-04.json",
      """{"events":[{"id":3,"day":"2024-01-04"}]}""")
    val src = new DeclarativeSource("s", m,
      config = Map("start" -> "2024-01-01"), fixtureRoot = Some(root))
    val slices = src.sliceUrls("events")
    assert(slices.map(_._2) == Seq(
      Map("start_time" -> "2024-01-01", "end_time" -> "2024-01-02"),
      Map("start_time" -> "2024-01-03", "end_time" -> "2024-01-04")))
    assert(src.recordJsonl(spark, "events").count() == 3)
    // windows fan out one-per-partition like any other slice
    assert(src.recordJsonl(spark, "events").rdd.getNumPartitions == 2)
  }

  test("incremental sync: cursor filters replayed records, state checkpoints") {
    val root = Files.createTempDirectory("graft-decl").toString
    val incManifest =
      """version: "0.29.0"
        |type: DeclarativeSource
        |streams:
        |  - type: DeclarativeStream
        |    name: tickets
        |    schema_loader:
        |      type: InlineSchemaLoader
        |      schema:
        |        type: object
        |        properties:
        |          id: {type: integer}
        |          updated_at: {type: string}
        |    incremental_sync:
        |      type: DatetimeBasedCursor
        |      cursor_field: updated_at
        |    retriever:
        |      type: SimpleRetriever
        |      requester:
        |        type: HttpRequester
        |        url_base: "https://api.example.com/v1"
        |        path: "/tickets"
        |      record_selector:
        |        type: RecordSelector
        |        extractor:
        |          type: DpathExtractor
        |          field_path: ["tickets"]
        |""".stripMargin
    def stage(rows: String): Unit =
      write(s"$root/api.example.com/v1/tickets.json", s"""{"tickets":[$rows]}""")
    stage("""{"id":1,"updated_at":"2024-01-01"},{"id":2,"updated_at":"2024-01-05"}""")
    val src = new DeclarativeSource("source-tickets", incManifest,
      fixtureRoot = Some(root))
    assert(src.catalog("tickets").cursorField.contains("updated_at"))
    val cache = SparkCache.fresh(spark, "graft_test_decl_inc")
    src.syncIncremental(cache, spark)
    assert(cache.table("tickets").count() == 2)
    assert(cache.latestState("source-tickets", "tickets").get.contains("2024-01-05"))
    // the API now returns an OVERLAPPING window: old rows replay + one new
    stage("""{"id":1,"updated_at":"2024-01-01"},{"id":2,"updated_at":"2024-01-05"},
            |{"id":3,"updated_at":"2024-02-01"}""".stripMargin)
    src.syncIncremental(cache, spark)
    // replayed ids 1-2 filtered by the cursor; only id 3 appended
    assert(cache.table("tickets").count() == 3)
    assert(cache.table("tickets").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(cache.latestState("source-tickets", "tickets").get.contains("2024-02-01"))
    // a third run with no new data is a no-op
    src.syncIncremental(cache, spark)
    assert(cache.table("tickets").count() == 3)
    cache.dropAll()
  }

  test("Sources.getSource dispatches manifests like the reference get_source") {
    val root = Files.createTempDirectory("graft-decl").toString
    stageFixtures(root)
    val src = graft.sources.Sources.getSource("source-example",
      sourceManifest = Some(manifest),
      config = Map("tenant" -> "acme"), fixtureRoot = Some(root))
    assert(src.isInstanceOf[DeclarativeSource])
    assert(src.catalog.streamNames == Seq("users", "orders"))
    // no install path without egress → explicit error, not a hang
    intercept[UnsupportedOperationException](
      graft.sources.Sources.getSource("source-faker"))
    intercept[IllegalArgumentException](
      graft.sources.Sources.getSource("x",
        localExecutable = Some(Seq("cat")), sourceManifest = Some(manifest)))
  }

  test("authenticators compute the headers a recorded request would carry") {
    def withAuth(authYaml: String): DeclarativeSource = new DeclarativeSource(
      "auth-test",
      s"""version: "0.29.0"
         |type: DeclarativeSource
         |streams:
         |  - type: DeclarativeStream
         |    name: items
         |    schema_loader:
         |      type: InlineSchemaLoader
         |      schema:
         |        type: object
         |        properties:
         |          id: {type: integer}
         |    retriever:
         |      type: SimpleRetriever
         |      requester:
         |        type: HttpRequester
         |        url_base: "https://api.example.com"
         |        path: "/items"
         |$authYaml
         |      record_selector:
         |        type: RecordSelector
         |        extractor:
         |          type: DpathExtractor
         |          field_path: []
         |""".stripMargin,
      config = Map("key" -> "s3cr3t", "user" -> "u1", "pw" -> "p@ss"))
    val indent = "        "
    assert(withAuth("").requestHeaders("items") == Map.empty)
    assert(withAuth(
      s"""${indent}authenticator:
         |$indent  type: BearerAuthenticator
         |$indent  api_token: "{{ config['key'] }}"""".stripMargin)
      .requestHeaders("items") == Map("Authorization" -> "Bearer s3cr3t"))
    assert(withAuth(
      s"""${indent}authenticator:
         |$indent  type: ApiKeyAuthenticator
         |$indent  api_token: "{{ config['key'] }}"
         |$indent  inject_into:
         |$indent    type: RequestOption
         |$indent    inject_into: header
         |$indent    field_name: X-Api-Key""".stripMargin)
      .requestHeaders("items") == Map("X-Api-Key" -> "s3cr3t"))
    // RFC 7617: base64("u1:p@ss")
    val expected = java.util.Base64.getEncoder
      .encodeToString("u1:p@ss".getBytes("UTF-8"))
    assert(withAuth(
      s"""${indent}authenticator:
         |$indent  type: BasicHttpAuthenticator
         |$indent  username: "{{ config['user'] }}"
         |$indent  password: "{{ config['pw'] }}"""".stripMargin)
      .requestHeaders("items") == Map("Authorization" -> s"Basic $expected"))
    // request_parameter injection would change fixture URL resolution —
    // rejected loudly, and unknown types never pass silently
    intercept[IllegalArgumentException](withAuth(
      s"""${indent}authenticator:
         |$indent  type: ApiKeyAuthenticator
         |$indent  api_token: "t"
         |$indent  inject_into:
         |$indent    type: RequestOption
         |$indent    inject_into: request_parameter
         |$indent    field_name: key""".stripMargin).requestHeaders("items"))
    intercept[IllegalArgumentException](withAuth(
      s"""${indent}authenticator:
         |$indent  type: OAuthAuthenticator
         |$indent  api_token: "t"""".stripMargin).requestHeaders("items"))
  }

  test("interpolation and ref resolution reject unknown keys/pointers") {
    val root = Files.createTempDirectory("graft-decl").toString
    val src = newSource(root)
    intercept[NoSuchElementException](
      new DeclarativeSource("x", manifest, config = Map.empty,
        fixtureRoot = Some(root)).sliceUrls("users"))
    intercept[IllegalArgumentException](
      DeclarativeSource.resolveRefs(DeclarativeSource.parseYaml(
        "a:\n  $ref: \"#/nope\"")))
    val _ = src
  }
}
