package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.Instant

import graft.{Engine, SparkSpec}
import graft.meta.{MetaStore, Model}

/** Replay of the reference's OWN example corpus — the 20 Bruno request
  * files it ships (backend/build/bruno/&#42;/&#42;.bru) — against this
  * repo's Api, as a conformance oracle (r16 verdict #3: the cheapest
  * executable spec of the reference's API surface was sitting unused).
  *
  * The corpus predates parts of main.go's CURRENT route table: most
  * examples use the old single-tenant shapes (`?table=x` query params,
  * `/:table` with no `:database` segment, a pre-batch maintenance
  * body). Those are NOT silently skipped and NOT blindly replayed:
  * each is classified, with the drift REASON pinned against the
  * reference's current code, and replayed in its MODERNIZED form
  * (bound to this spec's fixture entities). Every .bru on disk must be
  * covered by the classification table — a new corpus file fails the
  * suite loudly instead of being ignored. */
class ApiConformanceSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val corpusRoot = "/root/reference/backend/build/bruno"

  private val fixedNow = Instant.parse("2026-03-01T00:00:00Z")

  // the ApiSpec fixture, reduced: one database `db`, table `li` with
  // partitions/snapshots/files so every read route has rows to serve
  private lazy val store: MetaStore = {
    import MetaStore._
    val s = new MetaStore(spark, Files.createTempDirectory("bru").toString)
    s.write("partitions", spark.createDataset(Seq(
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "01"),
        0, 100L, 4L, 1L << 20, Timestamp.from(fixedNow), 3L, true),
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "02"),
        0, 50L, 2L, 1L << 19, Timestamp.from(fixedNow), 3L, false))))
    s.write("snapshots", spark.createDataset(Seq(
      Model.SnapshotMeta("db", "li", Timestamp.from(fixedNow), 3L, Some(2L),
        "append", "m3", Map.empty))))
    s.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "li", Seq(Model.TableColumn("id", "bigint")),
        Seq.empty, Some(3L), Timestamp.from(fixedNow)))))
    s.write("files", spark.createDataset(Seq(
      Model.FileMeta("db", "li", 3L, 0, "/nope/f.parquet", "PARQUET", 0,
        Map("year" -> "2026", "month" -> "01"), 10L, 100L))))
    s
  }
  private lazy val engine = new Engine(store, () => fixedNow)
  private lazy val server = new Api(store, engine, Some(sfDir)).start(0)
  private lazy val base = s"http://localhost:${server.getAddress.getPort}/api"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def send(method: String, path: String,
      body: String): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val r = client.send(
      (if (method == "GET" && body.isEmpty) b.GET()
       else b.method(method, HttpRequest.BodyPublishers.ofString(body)))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  // ---- minimal .bru parser (blocks of `name { key: value / raw }`) ----

  private case class Bru(method: String, url: String, bodyJson: String)

  /** Parse the blocks this corpus uses: a `meta` block (`type: http`
    * distinguishes requests from folder metadata), one HTTP-verb block
    * carrying `url:`, and an optional `body:json` block whose body is
    * raw JSON. Brace depth tracks block ends (the JSON bodies nest). */
  private def parseBru(text: String): Option[Bru] = {
    val blocks = scala.collection.mutable.Map[String, Vector[String]]()
    var name: Option[String] = None
    var depth = 0
    var acc = Vector.empty[String]
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (name.isEmpty) {
        val m = """^([A-Za-z:_-]+)\s*\{$""".r.findFirstMatchIn(t)
        if (m.isDefined) { name = Some(m.get.group(1)); depth = 1; acc = Vector.empty }
      } else {
        depth += t.count(_ == '{') - t.count(_ == '}')
        if (depth == 0) { blocks(name.get) = acc; name = None }
        else acc = acc :+ line
      }
    }
    def kv(block: String): Map[String, String] =
      blocks.getOrElse(block, Vector.empty).flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
      }.toMap
    if (!kv("meta").get("type").contains("http")) return None // folder meta
    val verb = Seq("get", "post", "put", "delete").find(blocks.contains)
      .getOrElse(sys.error("no verb block in .bru"))
    Some(Bru(verb.toUpperCase,
      kv(verb).getOrElse("url", sys.error("no url in .bru")),
      blocks.getOrElse("body:json", Vector.empty).mkString("\n").trim))
  }

  // ---- the classification table ---------------------------------------
  // `expect` pins what the corpus file actually says (method + the URL
  // after the host) so a regenerated corpus can't drift under the
  // classification unnoticed; `replay` is the request issued here.

  private case class Replay(method: String, path: String, body: String,
      pin: String)
  private case class Entry(expectMethod: String, expectUrl: String,
      drift: Option[String], replay: Replay)

  private val host = "http://localhost:8081"

  private val table: Map[String, Entry] = Map(
    // -- current: replayed exactly as shipped (host rebound) -----------
    "refresh/tables" -> Entry("GET", "/api/refresh/tables", None,
      Replay("GET", "/refresh/tables", "", "\"status\"")),
    "refresh/full" -> Entry("GET", "/api/refresh/full", None,
      Replay("GET", "/refresh/full", "", "\"status\"")),
    // -- stale: single-tenant shapes predating main.go's :database/
    // :table route table; modernized per the cited current route ------
    "browse/list tables" -> Entry("GET", "/api/browse/tables",
      Some("predates GET /api/browse/:database/tables (main.go:84)"),
      Replay("GET", "/browse/db/tables", "", "\"li\"")),
    "browse/table summary" -> Entry("GET", "/api/browse/:table",
      Some("predates GET /api/browse/:database/:table (main.go:85)"),
      Replay("GET", "/browse/db/li", "", "\"partitionCount\"")),
    "browse/list table partitions" -> Entry("GET", "/api/table/:table",
      Some("predates POST /api/browse/:database/:table/partitions " +
        "(main.go:86) — old path, and GET-with-body became POST"),
      Replay("POST", "/browse/db/li/partitions",
        """{"partitions": {"year": "2026"}}""", "\"value\"")),
    "iceberg/list tables" -> Entry("GET", "/api/iceberg/tables",
      Some("predates GET /api/iceberg/:database/tables (main.go:91)"),
      Replay("GET", "/iceberg/db/tables", "", "\"li\"")),
    "iceberg/describe table" -> Entry("GET", "/api/iceberg/:table",
      Some("predates GET /api/iceberg/:database/:table (main.go:92)"),
      Replay("GET", "/iceberg/db/li", "", "\"columns\"")),
    "iceberg/list snapshots" -> Entry("GET",
      "/api/iceberg/snapshots?table=adwordsevent",
      Some("?table= query form predates GET " +
        "/api/iceberg/:database/:table/snapshots (main.go:95)"),
      Replay("GET", "/iceberg/db/li/snapshots", "", "\"snapshotId\"")),
    "iceberg/list partitions" -> Entry("GET",
      "/api/iceberg/partitions?table=adwordsevent",
      Some("?table= query form predates GET " +
        "/api/iceberg/:database/:table/partitions (main.go:96)"),
      Replay("GET", "/iceberg/db/li/partitions", "", "\"partition\"")),
    "metadata/list snapshots" -> Entry("GET",
      "/api/metadata/snapshots?table=revenueEvent",
      Some("?table= query form predates GET " +
        "/api/metadata/:database/:table/snapshots (main.go:70)"),
      Replay("GET", "/metadata/db/li/snapshots", "", "\"snapshotId\"")),
    "metadata/list partitions" -> Entry("GET",
      "/api/metadata/partitions?table=revenueEvent",
      Some("?table= query form predates GET " +
        "/api/metadata/:database/:table/partitions (main.go:69)"),
      Replay("GET", "/metadata/db/li/partitions", "", "\"needsOptimize\"")),
    "maintenance/expire snapshots" -> Entry("POST",
      "/api/maintenance/:table/expire-snapshots",
      Some("predates the per-DATABASE batch route (main.go:42) — " +
        ":table became :database, the body gained tables[] and " +
        "dropped retain_last (handler_maintenance.go:12-16)"),
      Replay("POST", "/maintenance/db/expire-snapshots",
        """{"tables": ["li"], "retention_days": 7}""", "\"task_ids\"")),
    "refresh/table" -> Entry("GET", "/api/refresh/table?table=payoutevent",
      Some("?table= query form predates GET " +
        "/api/refresh/:database/:table (main.go:77)"),
      Replay("GET", "/refresh/db/lineitem", "", "\"status\"")),
    "refresh/partitions" -> Entry("GET",
      "/api/refresh/table/partitions?table=payoutevent",
      Some("?table= query form predates GET " +
        "/api/refresh/:database/:table/partitions (main.go:78)"),
      Replay("GET", "/refresh/db/lineitem/partitions", "", "\"partition\"")),
    "refresh/snapshots" -> Entry("GET",
      "/api/refresh/table/snapshots?table=payoutevent",
      Some("?table= query form predates GET " +
        "/api/refresh/:database/:table/snapshots (main.go:79)"),
      Replay("GET", "/refresh/db/lineitem/snapshots", "", "\"snapshotId\"")))

  test("every reference .bru example is replayed, or documented stale with its modern form replayed") {
    val root = java.nio.file.Paths.get(corpusRoot)
    assume(Files.isDirectory(root), s"reference corpus absent: $corpusRoot")
    val files: Seq[Path] = {
      val s = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.toString.endsWith(".bru")).toSeq
      } finally s.close()
    }
    assert(files.nonEmpty, "empty corpus")
    var replayed = 0
    var staleDocumented = 0
    val uncovered = Seq.newBuilder[String]
    // deterministic order, read routes before the state-writing
    // refresh/maintenance replays (refresh repopulates the store from
    // the live data root; asserting fixture reads first keeps each
    // pin's target unambiguous)
    val ordered = files.sortBy { f =>
      val g = f.getParent.getFileName.toString
      (Seq("iceberg", "metadata", "browse", "maintenance", "refresh")
        .indexOf(g), f.getFileName.toString)
    }
    ordered.foreach { f =>
      val key = s"${f.getParent.getFileName}/" +
        f.getFileName.toString.stripSuffix(".bru")
      parseBru(Files.readString(f)) match {
        case None => () // folder metadata, not a request
        case Some(bru) =>
          table.get(key) match {
            case None => uncovered += key
            case Some(e) =>
              // the corpus still says what the classification claims
              assert(bru.method == e.expectMethod &&
                bru.url == host + e.expectUrl,
                s"$key drifted on disk: ${bru.method} ${bru.url} vs " +
                  s"classified ${e.expectMethod} $host${e.expectUrl} — " +
                  "reclassify it")
              e.drift match {
                case None =>
                  // CURRENT: replay the shipped request itself
                  assert(e.expectUrl.stripPrefix("/api") == e.replay.path,
                    s"$key: a current entry must replay its own URL")
                case Some(reason) =>
                  staleDocumented += 1
                  info(s"STALE $key — $reason")
              }
              val (code, body) = send(e.replay.method, e.replay.path,
                e.replay.body)
              assert(code == 200,
                s"$key: ${e.replay.method} ${e.replay.path} -> $code $body")
              assert(body.contains(e.replay.pin),
                s"$key: response lacks ${e.replay.pin}: $body")
              // and the payload is valid JSON, like every Api response
              Json.parse(body)
              replayed += 1
          }
      }
    }
    assert(uncovered.result().isEmpty,
      s"corpus files not classified (replay or stale-with-reason): " +
        uncovered.result().mkString(", "))
    assert(replayed == table.size,
      s"classified ${table.size} requests but replayed $replayed — " +
        "a table entry has no corpus file (remove it)")
    info(s"replayed $replayed requests (${table.size - staleDocumented} " +
      s"current, $staleDocumented stale-with-reason)")
  }
}
