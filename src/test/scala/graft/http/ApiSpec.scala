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
    s.write("partitions", spark.createDataset(Seq(
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "01"),
        0, 100L, 4L, 1L << 20, Timestamp.from(fixedNow), 3L, true),
      Model.PartitionStat("db", "li", Map("year" -> "2026", "month" -> "02"),
        0, 50L, 2L, 1L << 19, Timestamp.from(fixedNow), 3L, false))))
    s.write("snapshots", spark.createDataset(Seq(
      Model.SnapshotMeta("db", "li", Timestamp.from(fixedNow), 3L, Some(2L),
        "append", "m3", Map.empty),
      Model.SnapshotMeta("db", "ev", Timestamp.from(fixedNow), 9L, Some(8L),
        "append", "m9", Map.empty),
      Model.SnapshotMeta("db", "ev", Timestamp.from(fixedNow), 8L, None,
        "append", "m8", Map.empty))))
    // `ev`: a partitioned table with a real spec — one identity field
    // plus a hidden day transform collapsing year/month/day onto
    // createdAt_day — and a $files slice for the files-browse and
    // missing-files routes (one path exists on disk, one does not).
    val evSpec = Seq(
      Model.PartitionField("businessUnitId", "businessUnitId", isHidden = false, None),
      Model.PartitionField("year", "createdAt_day", isHidden = true,
        Some(Model.HiddenTransform("createdAt", "day"))),
      Model.PartitionField("month", "createdAt_day", isHidden = true,
        Some(Model.HiddenTransform("createdAt", "day"))),
      Model.PartitionField("day", "createdAt_day", isHidden = true,
        Some(Model.HiddenTransform("createdAt", "day"))))
    val existing = Files.createTempFile("ev-file", ".parquet")
    s.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "li", Seq(Model.TableColumn("id", "bigint")),
        Seq.empty, Some(3L), Timestamp.from(fixedNow)),
      Model.TableMeta("db", "ev", Seq(Model.TableColumn("id", "bigint")),
        evSpec, Some(9L), Timestamp.from(fixedNow)))))
    s.write("files", spark.createDataset(Seq(
      Model.FileMeta("db", "ev", 9L, 0, existing.toString, "PARQUET", 0,
        Map("businessUnitId" -> "1", "createdAt_day" -> "2026-03-25"), 10L, 100L),
      Model.FileMeta("db", "ev", 9L, 0, "/nope/gone.parquet", "PARQUET", 0,
        Map("businessUnitId" -> "1", "createdAt_day" -> "2026-03-25"), 20L, 900L),
      // content=1 (deletes) and other-partition rows must not surface
      Model.FileMeta("db", "ev", 9L, 1, "/nope/delete.parquet", "PARQUET", 0,
        Map("businessUnitId" -> "1", "createdAt_day" -> "2026-03-25"), 1L, 10L),
      Model.FileMeta("db", "ev", 9L, 0, "/nope/other.parquet", "PARQUET", 0,
        Map("businessUnitId" -> "2", "createdAt_day" -> "2026-03-25"), 5L, 50L))))
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
    assert(get("/iceberg/db/tables") == (200, """["ev", "li"]"""))
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
    // Drill into year=2026 → next level (month) aggregation; both the
    // reference's wrapped body and the bare flat form bind.
    val (code, body) = send("POST", "/browse/db/li/partitions",
      """{"partitions": {"year": "2026"}}""")
    assert(code == 200, body)
    assert(body.contains(""""value": "01"""") && body.contains(""""value": "02""""))
    val (fc, fbody) = send("POST", "/browse/db/li/partitions", """{"year": "2026"}""")
    assert(fc == 200 && fbody == body)
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

  test("browse files: complete selection lists data files in F9 render order") {
    // hidden day transform resolves year/month/day → createdAt_day literal
    val (code, body) = send("POST", "/browse/db/ev/files",
      """{"businessUnitId": "1", "year": "2026", "month": "3", "day": "25"}""")
    assert(code == 200, body)
    // size DESC: the 900-byte missing file first, then the 100-byte one
    val idx900 = body.indexOf("\"file_size_in_bytes\": 900")
    val idx100 = body.indexOf("\"file_size_in_bytes\": 100")
    assert(idx900 >= 0 && idx100 >= 0 && idx900 < idx100, body)
    // selection-order partition rendering (identity field first — spec order)
    assert(body.contains("{businessUnitId=1, createdAt_day=2026-03-25}"), body)
    // content=1 delete files and other partitions are excluded
    assert(!body.contains("delete.parquet") && !body.contains("other.parquet"))
    // reference validation messages (handler_browse_test.go:40-67)
    val (ic, ierr) = send("POST", "/browse/db/ev/files",
      """{"year": "2026", "month": "03"}""")
    assert(ic == 400 &&
      ierr.contains("listing data files requires a complete partition selection"), ierr)
    val (uc, uerr) = send("POST", "/browse/db/ev/files",
      """{"businessUnitId": "1", "year": "2026", "month": "03", "day": "25", "unknown": "x"}""")
    assert(uc == 400 && uerr.contains("unknown partition key"), uerr)
    val (nc, nerr) = send("POST", "/browse/db/li/files", """{"a": "1"}""")
    assert(nc == 400 && nerr.contains("table does not define any partitions"), nerr)
  }

  test("iceberg: snapshot missing-files and rollback routes") {
    val (code, body) = get("/iceberg/db/ev/snapshots/9/missing-files")
    assert(code == 200, body)
    assert(body.contains(""""snapshot_id": 9"""))
    // the tempfile exists; the /nope paths do not (content=1 excluded)
    assert(body.contains("/nope/gone.parquet") && !body.contains("ev-file"), body)
    assert(!body.contains("delete.parquet"))
    // the uncapped total + truncation indicator ride along with the list
    assert(body.contains(""""missing_total": 2""") &&
      body.contains(""""truncated": false"""), body)
    // iceberg-group snapshot/partition aliases (main.go:95-96)
    assert(get("/iceberg/db/ev/snapshots")._2.contains(""""snapshotId": 9"""))
    assert(get("/iceberg/db/li/partitions")._2.contains("{month=01, year=2026}"))
    // rollback moves the pointer to the parent snapshot (main.go:93)
    val (rc, rbody) = send("POST", "/iceberg/db/ev/snapshots/8/rollback", "")
    assert(rc == 200 && rbody.contains(""""snapshot_id": 8"""), rbody)
    assert(rbody.contains(""""status": "ok""""))
    assert(get("/iceberg/db/ev")._2.contains(""""currentSnapshotId": 8"""))
    // unknown snapshot → server rejects
    assert(send("POST", "/iceberg/db/ev/snapshots/77/rollback", "")._1 != 200)
  }

  test("maintenance: database-wide batch enqueue with partial-failure semantics") {
    val (code, body) = send("POST", "/maintenance/db/expire-snapshots",
      """{"tables": ["li", " li ", "", "ev"], "retention_days": 3}""")
    assert(code == 200, body)
    // " li " dedupes against li; the blank drops → two tasks
    assert(body.contains(""""enqueued_count": 2"""), body)
    assert(body.contains(""""failed_tables": []"""))
    val (oc, obody) = send("POST", "/maintenance/db/remove-orphan-files",
      """{"tables": ["li"], "retention_days": 10}""")
    assert(oc == 200 && obody.contains(""""enqueued_count": 1"""), obody)
    // no tables → the reference's validation error
    assert(send("POST", "/maintenance/db/expire-snapshots",
      """{"tables": [], "retention_days": 3}""")._1 == 400)
    // batch optimize: bad range → 400; good range with no needs-optimize
    // partitions in range → zero ids, zero failures
    assert(send("POST", "/maintenance/db/optimize",
      """{"tables": [{"table": "li"}], "from": "2026-02-01", "to": "2026-01-01"}""")._1 == 400)
    val (bc, bbody) = send("POST", "/maintenance/db/optimize",
      """{"tables": [{"table": "li", "chunk_by": "day"}], "target_file_size_mb": 256, "from": "2020-01-01", "to": "2020-01-31"}""")
    assert(bc == 200 && bbody.contains(""""enqueued_count": 0"""), bbody)
  }

  test("tasks: per-db list/counts/flush, retry-all, procedure callback") {
    // seed: one errored task in db, one running spark task
    val errId = engine.queue.enqueue("db", "li", Model.TaskKind.ExpireSnapshots,
      "spark", Map("retention_days" -> "7"))
    while (engine.queue.claim(100).isDefined) {} // drain to running
    engine.queue.complete(errId, Map.empty, Some("boom"))
    val runId = engine.queue.enqueue("db", "ev", Model.TaskKind.Optimize,
      "spark", Map.empty)
    while (engine.queue.claim(100).exists(_.id != runId)) {}
    // per-db counts: running ≥ 1 (runId), queued 0 after drain
    val (_, counts) = get("/tasks/db/counts")
    assert(counts.contains(""""running": """), counts)
    // per-db filtered list: only error-status rows, canRetry flagged
    val (_, list) = get("/tasks/db?status=error&limit=50")
    assert(list.contains(""""canRetry": true"""), list)
    assert(!list.contains(""""status": "queued""""))
    // procedure callback on the running spark task
    val (cc, cbody) = send("POST", s"/tasks/callback/$runId/result",
      """{"query": "OPTIMIZE t", "rows": [{"a": 1}, {"a": 2}], "meta": {"src": "spark"}}""")
    assert(cc == 200 && cbody == """{"status": "ok"}""", cbody)
    val (_, after) = get(s"/tasks/db?limit=100")
    assert(after.contains("procedure"), after)
    // callback on a non-running task → 400
    assert(send("POST", s"/tasks/callback/$errId/result",
      """{"query": "q", "rows": []}""")._1 == 400)
    // per-db retry-all clones the errored task once
    val (rc, rbody) = send("POST", "/tasks/db/retry-all", "")
    assert(rc == 200 && rbody == """{"retried_count": 1}""", rbody)
    // a second pass finds nothing retryable (original flagged)
    assert(send("POST", "/tasks/retry-all", "")._2 == """{"retried_count": 0}""")
    // per-db flush removes terminal rows only
    val (fc, fbody) = send("DELETE", "/tasks/db", "")
    assert(fc == 200 && fbody.startsWith("""{"flushed":"""), fbody)
  }

  test("refresh: table full, partitions + snapshots granularity, database cascade") {
    // RefreshTableFull: table row + partitions + snapshots (main.go:78)
    val (code, body) = get("/refresh/db/nation")
    assert(code == 200 && body == """{"status": "ok"}""", body)
    assert(get("/iceberg/db/tables")._2.contains("nation"))
    // the granularity routes re-derive and return the slices
    val (pc, pbody) = get("/refresh/db/nation/partitions")
    assert(pc == 200 && pbody.contains("unpartitioned"), pbody)
    assert(pbody.contains(""""recordCount": 25"""))
    val (sc, sbody) = get("/refresh/db/nation/snapshots")
    assert(sc == 200 && sbody.contains(""""operation": "append""""), sbody)
    // database refresh registers every live table and cascade-deletes
    // stored tables absent from the data root (li/ev are not live files)
    val (c2, b2) = get("/refresh/db")
    assert(c2 == 200 && b2 == """{"status": "ok"}""", b2)
    assert(!get("/iceberg/db/tables")._2.contains("\"li\""))
    assert(get("/iceberg/db/tables")._2.contains("customer"))
    // /refresh/tables registers descriptions without erroring
    assert(get("/refresh/tables")._1 == 200)
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
