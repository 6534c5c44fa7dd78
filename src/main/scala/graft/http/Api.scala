package graft.http

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.Engine
import graft.meta.{MetaStore, Model, PartitionModel}

/** The REST façade — the reference's HTTP surface (main.go:37-101 route
  * map) over the same engine objects the CLI uses, served by the JDK's
  * built-in HttpServer so no dependency is added:
  *
  *  - /api/iceberg: databases, tables, describe (handler_iceberg.go)
  *  - /api/metadata: partitions, snapshots (handler_metadata.go)
  *  - /api/browse: tables, table summary, partition drill-down
  *    (handler_browse.go)
  *  - /api/tasks: list, counts, flush, retry, enqueue optimize /
  *    expire-snapshots / remove-orphan-files (handler_tasks.go)
  *  - /api/settings/task-concurrency GET/PUT (handler_settings.go)
  *
  * Request bodies are the reference's flat JSON objects; a micro-parser
  * handles the flat string/number shape (no JSON library ships in this
  * environment). All heavy lifting stays in the engine — handlers only
  * translate HTTP ↔ the operators, exactly like the reference's thin
  * gin handlers.
  */
final class Api(store: MetaStore, engine: Engine,
    dataRoot: Option[String] = None) {

  import Json._

  /** Start on `port` (0 = ephemeral); returns the server (caller stops). */
  def start(port: Int): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
    server.createContext("/api", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // serial — single-writer engine by design
    server.start()
    server
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath.stripPrefix("/api").stripSuffix("/")
    val segs = path.split("/").toList.filter(_.nonEmpty)
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val result =
      try route(method, segs, body)
      catch {
        // only the parse/bind layer raises BadRequest (missing body
        // keys, unparsable dates, non-numeric ids, bad escapes) — a
        // 400, like the reference's bind-error handling. An engine-
        // raised IllegalArgumentException (violated invariant, broken
        // lineage, bad settings row) is a genuine server fault: 500.
        case e: Api.BadRequest =>
          (400, obj("error" -> str(Option(e.getMessage).getOrElse(e.toString))))
        case e: Throwable =>
          (500, obj("error" -> str(Option(e.getMessage).getOrElse(e.toString))))
      }
    val bytes = result._2.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(result._1, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def route(method: String, segs: List[String], body: String): (Int, String) =
    (method, segs) match {
      // -- iceberg (handler_iceberg.go) -------------------------------
      case ("GET", "iceberg" :: "databases" :: Nil) =>
        ok(arr(store.tables.collect().map(_.database).distinct.sorted.map(str)))
      case ("GET", "iceberg" :: db :: "tables" :: Nil) =>
        ok(arr(store.tables.collect().filter(_.database == db).map(_.name).sorted.map(str)))
      case ("GET", "iceberg" :: db :: table :: Nil) =>
        store.tables.collect().find(t => t.database == db && t.name == table) match {
          case None => notFound(s"$db.$table")
          case Some(t) => ok(obj(
            "database" -> str(t.database), "table" -> str(t.name),
            "currentSnapshotId" -> t.currentSnapshotId.map(num).getOrElse("null"),
            "columns" -> arr(t.columns.map(c =>
              obj("name" -> str(c.name), "type" -> str(c.`type`))))))
        }

      // -- metadata (handler_metadata.go) -----------------------------
      case ("GET", "metadata" :: db :: table :: "partitions" :: Nil) =>
        val rows = store.partitions.collect()
          .filter(p => p.database == db && p.table == table)
          .sortBy(p => graft.meta.PartitionModel.canonicalString(p.partition))
        ok(arr(rows.map(p => obj(
          "partition" -> str(graft.meta.PartitionModel.canonicalString(p.partition)),
          "recordCount" -> num(p.recordCount), "fileCount" -> num(p.fileCount),
          "totalDataFileSizeInBytes" -> num(p.totalDataFileSizeInBytes),
          "needsOptimize" -> p.needsOptimize.toString))))
      case ("GET", "metadata" :: db :: table :: "snapshots" :: Nil) =>
        val rows = store.snapshots.collect()
          .filter(s => s.database == db && s.table == table).sortBy(-_.snapshotId)
        ok(arr(rows.map(s => obj(
          "snapshotId" -> num(s.snapshotId),
          "parentId" -> s.parentId.map(num).getOrElse("null"),
          "operation" -> str(s.operation),
          "committedAt" -> str(s.committedAt.toString)))))

      // -- browse (handler_browse.go) ---------------------------------
      case ("GET", "browse" :: db :: "tables" :: Nil) =>
        ok(arr(store.tables.collect().filter(_.database == db)
          .sortBy(_.name).map(t => obj(
            "name" -> str(t.name), "updatedAt" -> str(t.updatedAt.toString)))))
      case ("GET", "browse" :: db :: table :: Nil) =>
        val mine = store.partitions.collect()
          .filter(p => p.database == db && p.table == table)
        ok(obj(
          "partitionCount" -> num(mine.length.toLong),
          "fileCount" -> num(mine.map(_.fileCount).sum),
          "recordCount" -> num(mine.map(_.recordCount).sum),
          "totalDataFileSizeInBytes" -> num(mine.map(_.totalDataFileSizeInBytes).sum),
          "needsOptimize" -> mine.exists(_.needsOptimize).toString))
      case ("POST", "browse" :: db :: table :: "partitions" :: Nil) =>
        val filters = bind(Json.parseFlat(body))
        val spec = specOf(db, table)
        graft.operators.Browse.drillDown(
          store.partitions.filter(p => p.database == db && p.table == table),
          spec, filters) match {
          case Left(err) => (400, obj("error" -> str(err)))
          case Right(df) => ok(arr(df.collect().toSeq.map(r => obj(
            "value" -> str(String.valueOf(r.get(0))),
            "fileCount" -> num(r.getLong(1)), "recordCount" -> num(r.getLong(2)),
            "totalBytes" -> num(r.getLong(3)),
            "needsOptimize" -> r.getBoolean(4).toString,
            "needsOptimizeCount" -> num(r.getLong(5))))))
        }

      // -- tasks (handler_tasks.go) -----------------------------------
      case ("GET", "tasks" :: Nil) =>
        val (rows, total) = engine.queue.list(Seq.empty, 100, 0)
        ok(obj("total" -> num(total), "tasks" -> arr(rows.map(taskJson))))
      case ("GET", "tasks" :: "counts" :: Nil) =>
        ok(obj(engine.queue.counts().toSeq.sortBy(_._1)
          .map { case (k, v) => k -> num(v) }: _*))
      case ("DELETE", "tasks" :: Nil) =>
        ok(obj("flushed" -> num(engine.queue.flush())))
      case ("POST", "tasks" :: "retry" :: id :: Nil) =>
        engine.queue.retry(bind(id.toLong)) match {
          case Some(clone) => ok(obj("retryTaskId" -> num(clone)))
          case None => (400, obj("error" -> str(s"task $id cannot be retried")))
        }
      case ("POST", "tasks" :: db :: table :: "optimize" :: Nil) =>
        val (target, from, to, chunkBy) = bind {
          val in = Json.parseFlat(body)
          (in.get("target_file_size_mb").flatMap(_.toIntOption).getOrElse(0),
            java.time.LocalDate.parse(in("from")), java.time.LocalDate.parse(in("to")),
            in.getOrElse("chunk_by", "day"))
        }
        engine.enqueueOptimize(db, table, target, from, to, chunkBy) match {
          case Left(err) => (400, obj("error" -> str(err)))
          case Right(ids) => ok(obj("taskIds" -> arr(ids.map(num))))
        }
      case ("POST", "tasks" :: db :: table :: "expire-snapshots" :: Nil) =>
        val days = bind(Json.parseFlat(body)
          .get("retention_days").flatMap(_.toIntOption).getOrElse(7))
        ok(obj("taskId" -> num(engine.enqueueExpireSnapshots(db, table, days))))
      case ("POST", "tasks" :: db :: table :: "remove-orphan-files" :: Nil) =>
        val days = bind(Json.parseFlat(body)
          .get("retention_days").flatMap(_.toIntOption).getOrElse(7))
        ok(obj("taskId" -> num(engine.enqueueRemoveOrphanFiles(db, table, days))))

      // -- refresh (handler_refresh.go; GET like the reference) -------
      // The live catalog binding is a data-root directory: table `t` of
      // any database lives at <dataRoot>/<t> (the TESTDATA layout). A
      // real deployment swaps this for the Iceberg catalog client.
      case ("GET", "refresh" :: "full" :: db :: Nil) =>
        dataRoot match {
          case None => (400, obj("error" -> str("no data root configured")))
          case Some(root) =>
            // listFiles() is null for a missing/non-directory root
            val live = Option(new java.io.File(root).listFiles())
              .getOrElse(return (400,
                obj("error" -> str(s"data root $root is not a readable directory"))))
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
              .map(f => f.getName.stripSuffix(".parquet") -> f.getPath).toMap
            val stale = graft.operators.Refresh.fullRefresh(store, db, live,
              java.time.Instant.now())
            ok(obj("refreshed" -> num(live.size.toLong),
              "removedStale" -> num(stale.size.toLong)))
        }
      case ("GET", "refresh" :: db :: table :: Nil) =>
        dataRoot match {
          case None => (400, obj("error" -> str("no data root configured")))
          case Some(root) =>
            val path = s"$root/$table.parquet"
            graft.operators.Refresh.refreshTable(store, db, table, path,
              java.time.Instant.now())
            ok(obj("refreshed" -> str(s"$db.$table")))
        }

      // -- settings (handler_settings.go) -----------------------------
      case ("GET", "settings" :: "task-concurrency" :: Nil) =>
        ok(obj("taskConcurrency" -> num(
          store.intSetting("task_concurrency", Model.Defaults.TaskConcurrency).toLong)))
      case ("PUT", "settings" :: "task-concurrency" :: Nil) =>
        bind(Json.parseFlat(body)).get("task_concurrency").flatMap(_.toIntOption) match {
          case Some(v) if v >= 1 =>
            store.setSetting("task_concurrency", v.toString)
            ok(obj("taskConcurrency" -> num(v.toLong)))
          case _ => (400, obj("error" -> str("task_concurrency must be an int >= 1")))
        }

      case _ => notFound(segs.mkString("/"))
    }

  /** Expanded partition spec for drill-down: derived from the stored
    * partition keys — identity fields in canonical order (the stored
    * slice is the source of truth here, like the reference's cached
    * spec). */
  private def specOf(db: String, table: String): Seq[Model.PartitionField] = {
    val keys = store.partitions.collect()
      .filter(p => p.database == db && p.table == table)
      .flatMap(_.partition.keys).toSet
    PartitionModel.browseKeyOrder(keys, Seq("year", "month", "day"))
      .map(k => Model.PartitionField(k, k, isHidden = false, None))
  }

  private def taskJson(t: Model.TaskRow): String = obj(
    "id" -> num(t.id), "database" -> str(t.database), "table" -> str(t.table),
    "kind" -> str(t.kind), "engine" -> str(t.engine), "status" -> str(t.status),
    "retried" -> t.retried.toString,
    "errorMessage" -> t.errorMessage.map(str).getOrElse("null"),
    "input" -> obj(t.input.toSeq.sortBy(_._1).map { case (k, v) => k -> str(v) }: _*),
    "result" -> obj(t.result.toSeq.sortBy(_._1).map { case (k, v) => k -> str(v) }: _*))

  private def ok(json: String): (Int, String) = (200, json)
  private def notFound(what: String): (Int, String) =
    (404, obj("error" -> str(s"not found: $what")))

  /** Run a request parse/bind step, converting its failures (missing
    * keys, bad numbers/dates/escapes) to [[Api.BadRequest]] so the
    * top-level handler can tell client errors from engine faults. */
  private def bind[T](step: => T): T =
    try step catch {
      case e @ (_: NoSuchElementException | _: NumberFormatException |
          _: java.time.format.DateTimeParseException |
          _: IllegalArgumentException) =>
        throw new Api.BadRequest(Option(e.getMessage).getOrElse(e.toString))
    }
}

object Api {
  /** A client-input failure; raised only by the parse/bind layer. */
  final class BadRequest(msg: String) extends RuntimeException(msg)
}

/** Hand-rolled JSON: render helpers + a micro-parser for the flat
  * `{"key": "value" | number}` request bodies the reference's endpoints
  * take — no JSON dependency ships in this environment. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def num(n: Long): String = n.toString
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
  def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")

  private val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*(?:"((?:[^"\\]|\\.)*)"|(-?\d+(?:\.\d+)?))""".r

  /** Parse a flat JSON object of string/number values into a string map
    * (numbers keep their literal form). Nested values are not needed by
    * any reference endpoint body. */
  def parseFlat(body: String): Map[String, String] =
    pair.findAllMatchIn(body).map { m =>
      unescape(m.group(1)) -> (if (m.group(2) != null) unescape(m.group(2)) else m.group(3))
    }.toMap

  private def unescape(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case 't' => out += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }
}
