package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Instant, LocalDate}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, Model, SmallFiles}

/** Full maintenance cycle end-to-end (SURVEY.md §5 item 4): refresh →
  * stats → schedule cycle → claim → compact → complete — file counts
  * drop, query results unchanged, task results recorded. */
class EngineSpec extends SparkSpec {

  private val fixedNow = Instant.parse("1997-01-15T12:00:00Z")

  private def store(): MetaStore =
    new MetaStore(spark, Files.createTempDirectory("engine").toString)

  private def partStat(db: String, tbl: String, date: LocalDate,
      needs: Boolean): Model.PartitionStat =
    Model.PartitionStat(db, tbl,
      Map("year" -> f"${date.getYear}%04d", "month" -> f"${date.getMonthValue}%02d",
        "day" -> f"${date.getDayOfMonth}%02d"),
      0, 100L, 8L, 1L << 20, Timestamp.from(fixedNow), 1L, needs)

  test("enqueueOptimize: range clamp, needs_optimize filter, weekly chunk dedup") {
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    s.write("partitions", spark.createDataset(Seq(
      partStat("db", "t", LocalDate.of(1997, 1, 6), needs = true),
      partStat("db", "t", LocalDate.of(1997, 1, 7), needs = true),  // same week
      partStat("db", "t", LocalDate.of(1997, 1, 1), needs = true),  // prior week
      partStat("db", "t", LocalDate.of(1997, 1, 8), needs = false), // not flagged
      partStat("db", "t", LocalDate.of(1997, 1, 14), needs = true)  // too fresh (96h)
    )))
    val ids = engine.enqueueOptimize("db", "t", 0, LocalDate.of(1997, 1, 1),
      LocalDate.of(1997, 1, 31), "week").toOption.get
    // cutoff = Jan 11; weeks: Dec30-Jan5 (from Jan1, clamped to Jan1-5),
    // Jan6-12 clamped to Jan6-11. Jan14 is past the cutoff → dropped.
    assert(ids.size == 2)
    val (tasks, _) = engine.queue.list(Seq(Model.TaskStatus.Queued), 10, 0)
    val inputs = tasks.sortBy(_.id).map(_.input)
    assert(inputs.forall(_("target_file_size_mb") == "512")) // default applied
    assert(inputs.map(i => (i("from"), i("to"))).toSet ==
      Set(("1997-01-01", "1997-01-05"), ("1997-01-06", "1997-01-11")))
  }

  test("retention clamps to 7 days minimum") {
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    engine.enqueueExpireSnapshots("db", "t", 2)
    engine.enqueueRemoveOrphanFiles("db", "t", 100)
    val (tasks, _) = engine.queue.list(Seq.empty, 10, 0)
    val byKind = tasks.map(t => t.kind -> t.input("retention_days")).toMap
    assert(byKind(Model.TaskKind.ExpireSnapshots) == "7")
    assert(byKind(Model.TaskKind.RemoveOrphanFiles) == "100")
  }

  test("runCycle enqueues optimize + expire + orphans per stored table") {
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    s.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "t1", Seq.empty, Seq.empty, None, Timestamp.from(fixedNow)),
      Model.TableMeta("db", "t2", Seq.empty, Seq.empty, None, Timestamp.from(fixedNow)))))
    s.write("partitions", spark.createDataset(Seq(
      partStat("db", "t1", LocalDate.of(1997, 1, 5), needs = true))))
    val r = engine.runCycle(fixedNow)
    assert(r.tableCount == 2)
    assert(r.optimizeTasks == 1)   // only t1 has a flagged partition
    assert(r.expireTasks == 2 && r.orphanTasks == 2)
    assert(engine.queue.counts()(Model.TaskStatus.Queued) == 5L)
  }

  test("worker executes a claimed optimize task end-to-end: files drop, data unchanged") {
    import spark.implicits._
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    val dataDir = Files.createTempDirectory("engine-data").toString
    // Plant a small-file day range (8 files per day) in Jan 1996.
    graft.sources.Tables.lineitem(spark, sfDir)
      .withColumn("date", date_format($"l_shipdate", "yyyy-MM-dd"))
      .where($"date" >= "1996-01-01" && $"date" < "1996-01-08")
      .repartition(8, $"date", pmod($"l_orderkey", lit(8)))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(dataDir)
    val rowsBefore = spark.read.parquet(dataDir).count()

    s.write("partitions", spark.createDataset(Seq(
      partStat("db", "li", LocalDate.of(1996, 1, 3), needs = true))))
    val ids = engine.enqueueOptimize("db", "li", 512,
      LocalDate.of(1996, 1, 1), LocalDate.of(1996, 1, 7), "week").toOption.get
    assert(ids.size == 1)

    val done = engine.processNext(1, Map(("db", "li") -> dataDir))
    assert(done.contains(ids.head))
    val (tasks, _) = engine.queue.list(Seq(Model.TaskStatus.Success), 10, 0)
    assert(tasks.size == 1)
    val res = tasks.head.result
    assert(res("files_after").toLong < res("files_before").toLong)
    assert(spark.read.parquet(dataDir).count() == rowsBefore)
    // Queue drained.
    assert(engine.processNext(1, Map.empty).isEmpty)
  }

  test("transient failure auto-retries once to success") {
    import spark.implicits._
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    val dataDir = Files.createTempDirectory("engine-retry").toString
    graft.sources.Tables.lineitem(spark, sfDir)
      .withColumn("date", date_format($"l_shipdate", "yyyy-MM-dd"))
      .where($"date" >= "1996-01-01" && $"date" < "1996-01-08")
      .repartition(8, $"date", pmod($"l_orderkey", lit(8)))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(dataDir)
    s.write("partitions", spark.createDataset(Seq(
      partStat("db", "li", LocalDate.of(1996, 1, 3), needs = true))))
    val ids = engine.enqueueOptimize("db", "li", 512,
      LocalDate.of(1996, 1, 1), LocalDate.of(1996, 1, 7), "week").toOption.get
    // First attempt: no data path → transient error; the worker loop
    // flags the original and enqueues one clone automatically.
    assert(engine.processNext(1, Map.empty).contains(ids.head))
    val (errs, _) = engine.queue.list(Seq(Model.TaskStatus.Error), 10, 0)
    assert(errs.size == 1 && errs.head.retried)
    assert(errs.head.errorMessage.exists(_.contains("no data path")))
    // Second attempt (the clone) runs with the path restored → success.
    assert(engine.processNext(1, Map(("db", "li") -> dataDir)).isDefined)
    val (ok, _) = engine.queue.list(Seq(Model.TaskStatus.Success), 10, 0)
    assert(ok.size == 1)
    assert(engine.processNext(1, Map.empty).isEmpty) // queue drained
  }

  test("permanent failure ends as an error with retried=true, no retry loop") {
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    // Optimize task whose data path never appears → both attempts error.
    s.write("partitions", spark.createDataset(Seq(
      partStat("db", "t", LocalDate.of(1997, 1, 5), needs = true))))
    val ids = engine.enqueueOptimize("db", "t", 512,
      LocalDate.of(1997, 1, 1), LocalDate.of(1997, 1, 7), "day").toOption.get
    assert(engine.processNext(1, Map.empty).contains(ids.head)) // attempt 1
    assert(engine.processNext(1, Map.empty).isDefined)          // the auto clone
    assert(engine.processNext(1, Map.empty).isEmpty)            // nothing further
    val (errs, _) = engine.queue.list(Seq(Model.TaskStatus.Error), 10, 0)
    assert(errs.size == 2 && errs.forall(_.retried))
    // The terminal clone is also beyond manual retry.
    assert(errs.map(_.id).forall(id => engine.queue.retry(id).isEmpty))
  }

  test("settings rows steer the claim gate and small-file scoring at use time") {
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => fixedNow)
    engine.enqueueExpireSnapshots("db", "t", 7)
    engine.enqueueExpireSnapshots("db", "t2", 7)
    // Default gate (claim-arg 1) admits one task...
    assert(engine.queue.claim(1).isDefined)
    // ...and blocks the second while it runs.
    assert(engine.queue.claim(1).isEmpty)
    // A task_concurrency settings row overrides the caller's default on
    // the very next claim — no restart, no new queue object.
    s.setSetting("task_concurrency", "2", fixedNow)
    assert(engine.queue.claim(1).isDefined)
    // Clamp: <1 is read as 1 (service_task_queue.go:228-230).
    s.setSetting("task_concurrency", "0", fixedNow)
    assert(engine.queue.claim(5).isEmpty) // 2 running ≥ clamp(0)=1

    // Small-file thresholds resolve from settings with reference defaults.
    val base = SmallFiles.Config()
    assert(SmallFiles.fromSettings(s, base) == base) // absent keys → defaults
    s.setSetting("small_file_threshold_bytes", "1024", fixedNow)
    s.setSetting("small_file_min_count", "5", fixedNow)
    s.setSetting("small_file_min_share_percent", "50", fixedNow)
    val resolved = SmallFiles.fromSettings(s, base)
    assert(resolved.thresholdBytes == 1024L)
    assert(resolved.minCount == 5 && resolved.minSharePercent == 50)
    assert(resolved.delayHours == base.delayHours) // config-driven, not a setting
    // Scoring flips with the threshold: 3 files of 2000 bytes are not
    // "small" at threshold 1024, but are at the default 256 MB.
    val sizes = Seq(2000L, 2000L, 2000L)
    assert(!SmallFiles.needsOptimize(sizes, Map.empty, resolved, fixedNow))
    assert(SmallFiles.needsOptimize(sizes, Map.empty, base, fixedNow))
  }

  test("worker executes expire task against the snapshot chain") {
    import MetaStore._
    val s = store()
    val engine = new Engine(s, () => Instant.parse("2026-02-10T00:00:00Z"))
    def snap(id: Long, parent: Option[Long], at: String) =
      Model.SnapshotMeta("db", "t", Timestamp.valueOf(at), id, parent, "append", s"m$id", Map.empty)
    s.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "t", Seq.empty, Seq.empty, Some(3L),
        Timestamp.valueOf("2026-02-01 00:00:00")))))
    s.write("snapshots", spark.createDataset(Seq(
      snap(1, None, "2026-01-01 00:00:00"),
      snap(2, Some(1), "2026-01-02 00:00:00"),   // old branch, not ancestor
      snap(3, Some(1), "2026-02-09 00:00:00"))))
    engine.enqueueExpireSnapshots("db", "t", 7)
    assert(engine.processNext(1, Map.empty).isDefined)
    val kept = s.snapshots.collect().map(_.snapshotId).toSet
    assert(kept == Set(1L, 3L)) // 2 expired; 1 kept as ancestor of current 3
    val (tasks, _) = engine.queue.list(Seq(Model.TaskStatus.Success), 10, 0)
    assert(tasks.head.result("expired") == "1")
  }
}
