package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The standing SCD2 store must serve exactly the one-pass compression
  * of everything committed so far, converge under replays and crash
  * replays (manifest-committed batches), keep history APPEND-ONLY at
  * the file level, and keep maintenance (compact/vacuum) invisible to
  * readers. Streaming ingest is the same contract per micro-batch. */
class ScdStoreSpec extends SparkSpec {

  import ScdStore._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def log: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .where($"event_type" === "signup" || $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"event_type", $"ts")
  }

  private def rows(d: DataFrame): Seq[String] = {
    import spark.implicits._
    d.select($"user_id", $"event_type", $"event_id", $"valid_from",
        $"valid_to", $"is_current")
      .collect().map(_.toString).sorted.toSeq
  }

  private def full: Seq[String] =
    rows(ScdMerge.compress(log, "user_id", "ts", Seq("event_type"), Seq("event_id")))

  private def initHalves(dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val cut = lit("2024-01-16").cast("timestamp")
    val (early, late) = (log.where($"ts" < cut), log.where($"ts" >= cut))
    init(early, dir, "user_id", "ts", Seq("event_type"), Seq("event_id"))
    (early, late)
  }

  test("init + applyBatch serves the one-pass compression of the full log") {
    val dir = java.nio.file.Files.createTempDirectory("scd-eq").toString
    val (_, late) = initHalves(dir)
    applyBatch(late, dir, "b1")
    assert(rows(table(spark, dir)) == full)
  }

  test("a replayed label is a no-op; a crashed commit converges on replay") {
    val dir = java.nio.file.Files.createTempDirectory("scd-replay").toString
    val (_, late) = initHalves(dir)
    // crash INJECTED between the data writes and the manifest swap:
    // readers must still see the pre-batch table
    val before = rows(table(spark, dir))
    intercept[RuntimeException] {
      applyBatch(late, dir, "b1",
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    assert(rows(table(spark, dir)) == before,
      "an uncommitted batch leaked into the table")
    // replay with the same label: overwrites the orphans and commits
    applyBatch(late, dir, "b1")
    assert(rows(table(spark, dir)) == full)
    // second replay: committed = immutable = no-op
    applyBatch(late, dir, "b1")
    assert(rows(table(spark, dir)) == full)
    assert(manifest(spark, dir).applied == Seq("base", "b1"))
  }

  test("history is append-only at the FILE level across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-appendonly").toString
    val cut2 = lit("2024-01-21").cast("timestamp")
    val (_, late) = initHalves(dir)
    def baseFiles() = {
      val d = new java.io.File(s"$dir/history/batch=base")
      d.listFiles().map(f => f.getName -> f.lastModified()).sortBy(_._1).toSeq
    }
    val before = baseFiles()
    applyBatch(late.where($"ts" < cut2), dir, "b1")
    applyBatch(late.where($"ts" >= cut2), dir, "b2")
    assert(baseFiles() == before,
      "committing batches rewrote the base history partition")
    assert(rows(table(spark, dir)) == full)
  }

  test("asOf returns at most one state row per key (half-open intervals)") {
    val dir = java.nio.file.Files.createTempDirectory("scd-asof").toString
    val (_, late) = initHalves(dir)
    applyBatch(late, dir, "b1")
    val at = ts("2024-01-20 00:00:00")
    val snap = asOf(spark, dir, at)
    val perKey = snap.groupBy(col("user_id")).count()
      .where(col("count") > 1).count()
    assert(perKey == 0, "a key had two states at one instant")
    // every key whose history started by `at` has exactly one state
    val started = table(spark, dir).where(col("valid_from") <= lit(at))
      .select("user_id").distinct().count()
    assert(snap.count() == started)
  }

  test("a change-point boundary belongs to the NEW row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-boundary").toString
    val logS = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (1L, 2L, "b", ts("2024-01-05 00:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    init(logS, dir, "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val atChange = asOf(spark, dir, ts("2024-01-05 00:00:00"))
      .select("event_type").collect().map(_.getString(0)).toSeq
    assert(atChange == Seq("b"))
  }

  test("compactHistory merges labels; vacuum honors snapshots until they expire") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-compact").toString
    val cut2 = lit("2024-01-21").cast("timestamp")
    val (_, late) = initHalves(dir)
    applyBatch(late.where($"ts" < cut2), dir, "b1")
    applyBatch(late.where($"ts" >= cut2), dir, "b2")
    val before = rows(table(spark, dir))
    compactHistory(spark, dir, "merged-1")
    assert(rows(table(spark, dir)) == before)
    // every directory is still named by a RETAINED commit snapshot:
    // vacuum must sweep nothing, and time travel must still resolve
    assert(vacuum(spark, dir) == ((0, 0)),
      "vacuum swept a directory a retained snapshot references")
    assert(rows(tableAt(spark, dir, 3L)) == before)
    // expiry — not vacuum — is the retention decision
    assert(expireCommits(spark, dir, keepLast = 1) == 3)
    val (histSwept, curSwept) = vacuum(spark, dir)
    assert(histSwept == 3, s"expected base+b1+b2 swept, got $histSwept")
    assert(curSwept >= 1, "superseded current versions must be swept")
    assert(rows(table(spark, dir)) == before)
  }

  test("time travel reconstructs every commit's state exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-travel").toString
    val cut2 = lit("2024-01-21").cast("timestamp")
    val (early, late) = initHalves(dir)
    applyBatch(late.where($"ts" < cut2), dir, "b1")
    applyBatch(late.where($"ts" >= cut2), dir, "b2")
    def compress(d: DataFrame): Seq[String] =
      rows(ScdMerge.compress(d, "user_id", "ts", Seq("event_type"), Seq("event_id")))
    assert(rows(tableAt(spark, dir, 1L)) == compress(early))
    assert(rows(tableAt(spark, dir, 2L)) ==
      compress(early.unionByName(late.where($"ts" < cut2))))
    assert(rows(tableAt(spark, dir, 3L)) == full)
    assert(rows(tableAt(spark, dir, 3L)) == rows(table(spark, dir)))
    // the snapshot read is pinned to ITS directories: later commits
    // must not leak in
    assert(rows(tableAt(spark, dir, 1L)) != full)
  }

  test("applying the CDC delta to the FROM snapshot reconstructs the TO snapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-cdc").toString
    val cut2 = lit("2024-01-21").cast("timestamp")
    val (_, late) = initHalves(dir)
    applyBatch(late.where($"ts" < cut2), dir, "b1")
    applyBatch(late.where($"ts" >= cut2), dir, "b2")
    for ((from, to) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))) {
      val delta = changesBetween(spark, dir, from, to).localCheckpoint()
      val closes = delta.where($"_change_type" === "close").drop("_change_type")
      val opens = delta.where($"_change_type" === "open").drop("_change_type")
      // rows of FROM superseded by a close (same key + valid_from,
      // valid_to now set) drop out; closes and opens come in
      val fromTbl = tableAt(spark, dir, from)
      val kept = fromTbl.join(closes.select($"user_id", $"valid_from"),
        Seq("user_id", "valid_from"), "left_anti")
      val rebuilt = kept.unionByName(closes).unionByName(opens)
      assert(rows(rebuilt) == rows(tableAt(spark, dir, to)),
        s"delta ($from -> $to) does not reconstruct the snapshot")
    }
  }

  test("a compact inside the CDC window falls back to the exact diff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-cdc-compact").toString
    val cut2 = lit("2024-01-21").cast("timestamp")
    val (_, late) = initHalves(dir)
    applyBatch(late.where($"ts" < cut2), dir, "b1")
    applyBatch(late.where($"ts" >= cut2), dir, "b2")
    def strs(d: DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    val cheap = strs(changesBetween(spark, dir, 1L, 3L))
    compactHistory(spark, dir, "merged-1")
    // window (1, 4] contains the compact commit: per-batch dirs are
    // folded, so the read must take the exact-diff path — and agree,
    // because compaction never changes semantics
    val fallback = strs(changesBetween(spark, dir, 1L, 4L))
    assert(fallback == cheap,
      "the compact-window fallback disagreed with the batch-dir delta")
  }

  test("expired commits refuse time travel, naming the live commit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-expire").toString
    val (_, late) = initHalves(dir)
    applyBatch(late, dir, "b1")
    assert(expireCommits(spark, dir, keepLast = 1) == 1)
    val live = rows(table(spark, dir))
    assert(rows(tableAt(spark, dir, 2L)) == live, "the kept commit must resolve")
    val ex = intercept[IllegalArgumentException](tableAt(spark, dir, 1L))
    assert(ex.getMessage.contains("not retained") &&
      ex.getMessage.contains("live commit is 2"))
  }

  test("a replayed label is STILL a no-op after compaction folded its data away") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-compact-replay").toString
    val (_, late) = initHalves(dir)
    applyBatch(late, dir, "b1")
    val before = rows(table(spark, dir))
    compactHistory(spark, dir, "merged-1")
    // the applied LEDGER must survive the fold: a streaming restart
    // that re-runs epoch b1 after a nightly compact must not re-merge
    // (it would trip the out-of-order guard and wedge ingest)
    applyBatch(late, dir, "b1")
    assert(rows(table(spark, dir)) == before)
    assert(manifest(spark, dir).applied.contains("b1"))
    assert(manifest(spark, dir).histLive == Seq("merged-1"))
  }

  test("streaming ingest drains to the batch table; restart is exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd-stream").toString
    val src = java.nio.file.Files.createTempDirectory("scd-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scd-ckpt").toString
    val (_, late) = initHalves(dir)
    // three source files → micro-batches, in change-time order so no
    // batch is out-of-order w.r.t. the standing current rows
    val (c2, c3) = (lit("2024-01-21").cast("timestamp"),
      lit("2024-01-26").cast("timestamp"))
    late.where($"ts" < c2).coalesce(1).write.parquet(s"$src/f1")
    val schema = late.schema
    val q1 = ingestStream(
      spark.readStream.schema(schema).parquet(s"$src/f1"),
      dir, ckpt + "/c1")
    q1.awaitTermination()
    late.where($"ts" >= c2 && $"ts" < c3).coalesce(1).write.parquet(s"$src/f2")
    late.where($"ts" >= c3).coalesce(1).write.parquet(s"$src/f3")
    // a SECOND stream over all three dirs with a fresh checkpoint would
    // replay f1 — the label replay no-op must absorb it. Stream the
    // union dir-by-dir with the SAME per-source checkpoints instead,
    // plus one deliberate duplicate label application.
    val q2 = ingestStream(
      spark.readStream.schema(schema).parquet(s"$src/f2"),
      dir, ckpt + "/c2", labelPrefix = "e2")
    q2.awaitTermination()
    applyBatch(spark.read.parquet(s"$src/f2"), dir, "e2-0") // replay: no-op
    val q3 = ingestStream(
      spark.readStream.schema(schema).parquet(s"$src/f3"),
      dir, ckpt + "/c3", labelPrefix = "e3")
    q3.awaitTermination()
    assert(rows(table(spark, dir)) == full)
  }
}
