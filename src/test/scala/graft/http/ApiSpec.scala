package graft.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.{Engine, SparkSpec}
import graft.meta.{MetaStore, Model}

/** The REST façade end-to-end over a live HttpServer on an ephemeral
  * port: route coverage for the iceberg/metadata/browse/tasks/settings
  * groups (reference main.go:37-101). */
class ApiSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val fixedNow = Instant.parse("2026-03-01T00:00:00Z")

  private lazy val store: MetaStore = {
    import MetaStore._
    val s = new MetaStore(spark, Files.createTempDirectory("api").toString)
    s.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "li", Seq(Model.TableColumn("id", "bigint")),
        Seq.empty, Some(3L), Timestamp.from(fixedNow)))))
    s.write("partitions", spark.createDataset(Seq(
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "01"),
        0, 100L, 4L, 1L << 20, Timestamp.from(fixedNow), 3L, true),
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "02"),
        0, 50L, 2L, 1L << 19, Timestamp.from(fixedNow), 3L, false))))
    s.write("snapshots", spark.createDataset(Seq(
      Model.SnapshotMeta("db", "li", Timestamp.from(fixedNow), 3L, Some(2L),
        "append", "m3", Map.empty))))
    s
  }
  private lazy val engine = new Engine(store, () => fixedNow)
  private lazy val server = new Api(store, engine, Some(sfDir)).start(0)
  private lazy val base = s"http://localhost:${server.getAddress.getPort}/api"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def get(path: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def send(method: String, path: String, body: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(base + path))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("iceberg: databases, tables, describe, 404") {
    assert(get("/iceberg/databases") == (200, """["db"]"""))
    assert(get("/iceberg/db/tables") == (200, """["li"]"""))
    val (code, body) = get("/iceberg/db/li")
    assert(code == 200 && body.contains(""""currentSnapshotId": 3"""))
    assert(body.contains(""""name": "id""""))
    assert(get("/iceberg/db/nope")._1 == 404)
  }

  test("metadata: partitions with canonical strings and snapshots") {
    val (code, body) = get("/metadata/db/li/partitions")
    assert(code == 200)
    assert(body.contains("{month=01, year=2026}"))
    assert(body.contains(""""needsOptimize": true"""))
    val (c2, b2) = get("/metadata/db/li/snapshots")
    assert(c2 == 200 && b2.contains(""""snapshotId": 3""") && b2.contains(""""parentId": 2"""))
  }

  test("browse: table list, summary, drill-down with filters") {
    assert(get("/browse/db/tables")._2.contains(""""name": "li""""))
    val (_, summary) = get("/browse/db/li")
    assert(summary.contains(""""partitionCount": 2"""))
    assert(summary.contains(""""fileCount": 6"""))
    assert(summary.contains(""""needsOptimize": true"""))
    // Drill into year=2026 → next level (month) aggregation.
    val (code, body) = send("POST", "/browse/db/li/partitions", """{"year": "2026"}""")
    assert(code == 200, body)
    assert(body.contains(""""value": "01"""") && body.contains(""""value": "02""""))
    // Unknown key → 400 with the reference's validation error.
    val (bad, err) = send("POST", "/browse/db/li/partitions", """{"bogus": "1"}""")
    assert(bad == 400 && err.contains("unknown partition key"))
  }

  test("tasks: enqueue via POST, list, counts, retry validation, flush") {
    val (code, body) = send("POST", "/tasks/db/li/expire-snapshots",
      """{"retention_days": 3}""")
    assert(code == 200 && body.contains("taskId"))
    val (_, list) = get("/tasks")
    assert(list.contains(""""kind": "expire_snapshots""""))
    assert(list.contains(""""retention_days": "7"""")) // clamped to the 7-day minimum
    val (_, counts) = get("/tasks/counts")
    assert(counts.contains(""""queued": 1"""))
    // Queued task is not retryable.
    val id = """"id": (\d+)""".r.findFirstMatchIn(list).get.group(1)
    assert(send("POST", s"/tasks/retry/$id", "")._1 == 400)
    // Optimize with a bad range → 400.
    val (oc, oerr) = send("POST", "/tasks/db/li/optimize",
      """{"from": "2026-02-01", "to": "2026-01-01"}""")
    assert(oc == 400 && oerr.contains("from date must be before"))
    assert(send("DELETE", "/tasks", "")._2 == """{"flushed": 0}""") // none terminal
    // Malformed client input is a 400, not a 500: empty body (missing
    // "from"), unparsable date, non-numeric retry id.
    assert(send("POST", "/tasks/db/li/optimize", "{}")._1 == 400)
    assert(send("POST", "/tasks/db/li/optimize",
      """{"from": "not-a-date", "to": "2026-01-01"}""")._1 == 400)
    assert(send("POST", "/tasks/retry/abc", "")._1 == 400)
  }

  test("refresh: one table from the data root, then full refresh cascades") {
    val (code, body) = get("/refresh/db/nation")
    assert(code == 200 && body.contains("db.nation"), body)
    assert(get("/iceberg/db/tables")._2.contains("nation"))
    // Full refresh registers every live table and cascade-deletes the
    // stored tables absent from the data root (li is not a live file).
    val (c2, b2) = get("/refresh/full/db")
    assert(c2 == 200 && b2.contains("removedStale"), b2)
    assert(!get("/iceberg/db/tables")._2.contains("\"li\""))
  }

  test("settings: GET default, PUT upsert, validation") {
    assert(get("/settings/task-concurrency") == (200, """{"taskConcurrency": 1}"""))
    assert(send("PUT", "/settings/task-concurrency",
      """{"task_concurrency": 4}""") == (200, """{"taskConcurrency": 4}"""))
    assert(get("/settings/task-concurrency")._2 == """{"taskConcurrency": 4}""")
    assert(send("PUT", "/settings/task-concurrency",
      """{"task_concurrency": 0}""")._1 == 400)
  }
}
