package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The standing interval index must be semantically invisible (lookup ==
  * the in-flight banded join on the same data), replay-idempotent under
  * at-least-once appends, and actually PRUNE: the band partition column
  * must carry a dynamic-pruning filter into the store scan, because
  * reading the whole store for a narrow point batch is the difference
  * between an index and a copy. */
class IntervalIndexStoreSpec extends SparkSpec {

  private def views: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir).where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
  }
  private def purchases: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir).where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
  }

  private def pairs(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.select($"i_view_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  test("lookup equals the in-flight banded join exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivx-eq").toString
    IntervalIndexStore.build(views, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    val got = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    val expect = pairs(IntervalJoin.pointInInterval(purchases, views,
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      bandSeconds = 3L * 86400L))
    assert(got.nonEmpty && got == expect)
  }

  test("band partition column carries a dynamic pruning filter into the store scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivx-dpp").toString
    IntervalIndexStore.build(views, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    // a narrow point batch: the busiest purchase day → ≤2 bands
    import spark.implicits._
    val busiest = purchases.groupBy(to_date($"ts").as("d")).count()
      .orderBy(desc("count"), $"d").limit(1).collect().head.getDate(0)
    val day = purchases.where(to_date($"ts") === lit(busiest))
    assert(day.count() > 0, "vacuous: no purchases on the probe day")
    val q = IntervalIndexStore.lookup(spark, dir, broadcast(day), "ts")
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("dynamicpruning"),
      s"no dynamic partition pruning on the band column:\n$phys")
    // and the pruning is MEASURED, not just planned: after execution the
    // store scan's partitions-read metric must be within the point
    // batch's own band count — the whole point of the layout
    q.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val storeScan = scans(q.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(_.toString.contains("dynamicpruning")))
    assert(storeScan.size == 1, s"expected exactly one pruned store scan, got ${storeScan.size}")
    val read = storeScan.head.metrics("numPartitions").value
    val pointBands = day
      .select(expr(s"unix_micros(ts) div ${3L * 86400L * 1000000L}L")).distinct().count()
    val totalBands = IntervalIndexStore.audit(spark, dir)
      .collect().head.getLong(2)
    assert(totalBands > pointBands,
      s"vacuous: store spans only $totalBands bands for a $pointBands-band probe")
    assert(read > 0 && read <= pointBands,
      s"store scan read $read partitions; the probe touches only $pointBands of $totalBands bands")
  }

  test("appends land; replaying the same label is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-app").toString
    val (oldV, newV) = (views.where($"view_id" % 2 === 0),
      views.where($"view_id" % 2 =!= 0))
    IntervalIndexStore.build(oldV, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    val partial = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    IntervalIndexStore.append(newV, dir, "delta1")
    IntervalIndexStore.append(newV, dir, "delta1") // at-least-once replay
    val full = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    val expect = pairs(IntervalJoin.pointInInterval(purchases, views,
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      bandSeconds = 3L * 86400L))
    assert(full == expect, "replayed append duplicated or lost pairs")
    assert(partial.size < full.size, "append test vacuous: delta added nothing")
    // audit sees both batches and a sane banded-row count
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(1) == 2, s"expected 2 ingest batches, got ${a.getLong(1)}")
    assert(a.getLong(0) >= views.count(), "banded rows below interval count")
    // a committed label is IMMUTABLE: replaying it with different data
    // is a no-op, never an in-place rewrite of a live directory
    IntervalIndexStore.append(oldV, dir, "delta1")
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts")) == full,
      "replay of a live label rewrote its data")
  }

  test("compact merges live labels behind one manifest swap; vacuum sweeps the old dirs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-cmp").toString
    IntervalIndexStore.build(views.where($"view_id" % 2 === 0), dir,
      "user_id", "w_start", "w_end", bandSeconds = 3L * 86400L)
    IntervalIndexStore.append(views.where($"view_id" % 2 =!= 0), dir, "delta1")
    val before = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    IntervalIndexStore.compact(spark, dir, "compacted1")
    val after = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    assert(after == before, "compact changed lookup results")
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(1) == 1, s"expected 1 live batch after compact, got ${a.getLong(1)}")
    // compacting into a live label is refused; the old dirs are orphans
    // on disk until vacuum
    intercept[IllegalArgumentException](
      IntervalIndexStore.compact(spark, dir, "compacted1"))
    def labelDirs = new java.io.File(s"$dir/intervals").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(labelDirs == Set("ingest_batch=base", "ingest_batch=delta1",
      "ingest_batch=compacted1"))
    val (orphans, expired) = IntervalIndexStore.vacuum(spark, dir)
    assert(orphans == 2 && expired == 0, s"vacuum removed ($orphans, $expired)")
    assert(labelDirs == Set("ingest_batch=compacted1"))
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts")) == before)
  }

  test("an uncommitted append is invisible until its manifest commit; vacuum sweeps it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-crash").toString
    IntervalIndexStore.build(views.where($"view_id" % 2 === 0), dir,
      "user_id", "w_start", "w_end", bandSeconds = 3L * 86400L)
    val baseOnly = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    // crash between the parquet write and the manifest commit: run the
    // append, then restore the pre-append manifest FILE — on-disk state
    // is exactly what a crash in between leaves behind (raw file
    // restore, not the API: writeManifest's swap-slot CAS rightly
    // refuses to move the pointer backward)
    val manifestFile = java.nio.file.Paths.get(s"$dir/_live.json")
    val preCrash = java.nio.file.Files.readString(manifestFile)
    IntervalIndexStore.append(views.where($"view_id" % 2 =!= 0), dir, "delta1")
    java.nio.file.Files.writeString(manifestFile, preCrash)
    assert(new java.io.File(s"$dir/intervals/ingest_batch=delta1").exists())
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts")) == baseOnly,
      "uncommitted append leaked into lookups")
    assert(IntervalIndexStore.vacuum(spark, dir) == (1, 0))
    assert(!new java.io.File(s"$dir/intervals/ingest_batch=delta1").exists())
    // the at-least-once replay lands and commits
    IntervalIndexStore.append(views.where($"view_id" % 2 =!= 0), dir, "delta1")
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts")).size
      > baseOnly.size)
  }

  test("expire drops old slices logically; vacuum and compact make it physical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-exp").toString
    val iv = Seq((1L, 10L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
      (1L, 20L, "2024-03-01 00:00:00", "2024-03-02 00:00:00"))
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    IntervalIndexStore.build(iv, dir, "user_id", "w_start", "w_end",
      bandSeconds = 86400L)
    val pts = Seq((100L, 1L, "2024-01-01 12:00:00"), (200L, 1L, "2024-03-01 12:00:00"))
      .toDF("event_id", "user_id", "t").select($"event_id", $"user_id",
        $"t".cast("timestamp").as("ts"))
    def matched() = IntervalIndexStore.lookup(spark, dir, pts, "ts")
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(matched() == Seq(100L, 200L))
    IntervalIndexStore.expire(spark, dir, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(matched() == Seq(200L), "expired slice still matched")
    // physical reclaim: the January interval's two 1-day band dirs go
    val (orphans, expired) = IntervalIndexStore.vacuum(spark, dir)
    assert((orphans, expired) == (0, 2), s"vacuum removed ($orphans, $expired)")
    assert(matched() == Seq(200L))
    // compact after expiry keeps only the surviving slices
    IntervalIndexStore.compact(spark, dir, "c1")
    assert(matched() == Seq(200L))
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(0) == 2, s"March interval on 1-day bands → 2 rows, got ${a.getLong(0)}")
  }

  test("streaming ingest: crash after an epoch's append but before its offset commit stays exactly-once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-stream").toString
    IntervalIndexStore.build(views.where($"view_id" % 2 === 0), dir,
      "user_id", "w_start", "w_end", bandSeconds = 3L * 86400L)
    // the odd views arrive as a stream, two source chunks +
    // maxFilesPerTrigger=1 → at least two epochs; the crash fires in
    // the window the label-per-epoch design exists for: append done
    // (parquet + manifest), offset NOT committed → the restart REPLAYS
    // that epoch under the same label
    val delta = views.where($"view_id" % 2 =!= 0).cache()
    val n = delta.count()
    val srcDir = java.nio.file.Files.createTempDirectory("ivx-stream-src").toString
    val half = delta.limit((n / 2).toInt).cache()
    half.coalesce(1).write.parquet(s"$srcDir/c0")
    delta.exceptAll(half).coalesce(1).write.parquet(s"$srcDir/c1")
    half.unpersist(); delta.unpersist()
    val ckpt = java.nio.file.Files.createTempDirectory("ivx-stream-ckpt").toString
    val schema = spark.read.parquet(s"$srcDir/c0").schema

    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/c*")
      IntervalIndexStore.ingestStream(stream, dir, ckpt,
        afterAppend = id =>
          if (id >= 1 && crashArmed.getAndSet(false))
            throw new RuntimeException(s"injected crash after append of epoch $id"))
    }
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run().awaitTermination()
    }
    assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)
    // non-vacuous: the crashed epoch's append IS committed in the store
    val livePreRestart = IntervalIndexStore.manifest(spark, dir).live
    assert(livePreRestart.exists(_.startsWith("epoch-")),
      s"crash fired before any epoch appended (live: $livePreRestart)")

    run().awaitTermination() // same checkpoint: replays the torn epoch
    val got = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    val expect = pairs(IntervalJoin.pointInInterval(purchases, views,
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      bandSeconds = 3L * 86400L))
    assert(got == expect, "replayed epoch duplicated or lost interval rows")
  }

  test("reserved label and degenerate intervals are rejected/dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-guard").toString
    // degenerate + NULL-bound rows vanish at build (they can never match)
    val bad = Seq(
      (1L, 10L, "2024-01-05 00:00:00", "2024-01-01 00:00:00"), // reversed
      (1L, 11L, null, "2024-01-02 00:00:00"),                  // NULL start
      (1L, 12L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")) // good
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    IntervalIndexStore.build(bad, dir, "user_id", "w_start", "w_end",
      bandSeconds = 86400L)
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(0) == 2, s"1-day interval on 1-day bands → 2 banded rows, got ${a.getLong(0)}")
    intercept[IllegalArgumentException](
      IntervalIndexStore.append(bad, dir, "base"))
    // labels name directories and _live.json values — F8 allowlist
    intercept[IllegalArgumentException](
      IntervalIndexStore.append(bad, dir, """x","y"""))
    intercept[IllegalArgumentException](
      IntervalIndexStore.compact(spark, dir, "a/b"))
    // column names are spliced into _meta.json and the banding SQL —
    // same allowlist as labels
    intercept[IllegalArgumentException](
      IntervalIndexStore.build(bad.withColumnRenamed("w_start", "w\"start"),
        java.nio.file.Files.createTempDirectory("ivx-col").toString,
        "user_id", "w\"start", "w_end", bandSeconds = 86400L))
    // building from zero valid intervals is rejected with a pointed
    // message, not a latent schema-inference failure at first lookup
    val allBad = bad.where($"view_id" =!= 12L)
    val dir2 = java.nio.file.Files.createTempDirectory("ivx-empty").toString
    val e = intercept[IllegalArgumentException](
      IntervalIndexStore.build(allBad, dir2, "user_id", "w_start", "w_end",
        bandSeconds = 86400L))
    assert(e.getMessage.contains("no valid intervals"), e.getMessage)
    // an APPEND whose rows are all invalid commits nothing and leaves
    // no directory — a live fileless label would poison the read once
    // it is the last one standing
    IntervalIndexStore.append(allBad, dir, "nothing")
    assert(IntervalIndexStore.manifest(spark, dir).live == Seq("base"))
    assert(!new java.io.File(s"$dir/intervals/ingest_batch=nothing").exists())
  }

  test("open-ended store: NULL-end current rows match by key, never band, never expire") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-open").toString
    // user 1: a closed Jan state then an open (current) state from Mar;
    // user 2: closed-only
    val iv = Seq(
      (1L, "old", "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
      (1L, "cur", "2024-03-01 00:00:00", null),
      (2L, "only", "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("user_id", "tag", "s", "e")
      .select($"user_id", $"tag", $"s".cast("timestamp").as("valid_from"),
        $"e".cast("timestamp").as("valid_to"))
    IntervalIndexStore.build(iv, dir, "user_id", "valid_from", "valid_to",
      bandSeconds = 7L * 86400L, openEnded = true)
    val pts = Seq((10L, 1L, "2024-01-15 00:00:00"), // in user 1's closed state
      (20L, 1L, "2025-06-01 00:00:00"),             // far future: current only
      (30L, 2L, "2024-03-01 00:00:00"))             // after user 2's only state
      .toDF("event_id", "user_id", "t")
      .select($"event_id", $"user_id", $"t".cast("timestamp").as("ts"))
    def tags() = IntervalIndexStore.lookup(spark, dir, pts, "ts")
      .select($"event_id", $"i_tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // boundary note: 2024-01-15 is inside [old]; 2024-03-01 00:00 hits
    // BOTH old's inclusive end and cur's start — inclusive on purpose
    // (the between contract); no point probes that boundary here
    assert(tags() == Seq((10L, "old"), (20L, "cur")))
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(3) == 1, s"expected 1 open row, got ${a.getLong(3)}")
    // the open-side store scan is STATICALLY pruned to the one
    // OpenBand partition — the current-row join never lists the bands
    val plan = IntervalIndexStore.lookup(spark, dir, pts, "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"= ${IntervalIndexStore.OpenBand}"),
      s"no static OpenBand partition filter in:\n$plan")
    // expiry never touches current rows: drop everything before 2025 —
    // the open state (whose START is 2024) must still match
    IntervalIndexStore.expire(spark, dir, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    assert(tags() == Seq((20L, "cur")), "open row lost to expiry")
    val (_, expired) = IntervalIndexStore.vacuum(spark, dir)
    assert(expired > 0, "vacuum deleted no closed slices")
    assert(tags() == Seq((20L, "cur")), "vacuum touched the open partition")
    // compact rewrites the store through the same partitionBy — the
    // open partition must survive the merge
    IntervalIndexStore.compact(spark, dir, "c1")
    assert(tags() == Seq((20L, "cur")), "compact dropped the open partition")
    assert(IntervalIndexStore.audit(spark, dir).collect().head.getLong(3) == 1)
  }

  test("a closed interval wider than the band cap fails fast with a pointed message") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-cap").toString
    val sentinel = Seq((1L, "2024-01-01 00:00:00", "9999-12-31 00:00:00"))
      .toDF("user_id", "s", "e")
      .select($"user_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    val e = intercept[Exception](
      IntervalIndexStore.build(sentinel, dir, "user_id", "w_start", "w_end",
        bandSeconds = 86400L))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBandsPerInterval")),
      s"wrong failure for a sentinel-wide interval: ${msgs(e).mkString(" | ")}")
  }

  test("expire bands like Spark's div does: pre-1970 slices strictly before the cutoff stop matching") {
    import spark.implicits._
    // band assignment truncates toward zero (Spark `div`); an expire
    // floor computed with floorDiv would be one band too low for
    // negative times and KEEP this interval, which ends strictly
    // before the cutoff
    val dir = java.nio.file.Files.createTempDirectory("ivx-1969").toString
    val iv = Seq((1L, 10L, "1969-12-30 06:00:00", "1969-12-30 18:00:00"))
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    // a post-cutoff interval keeps the store non-empty (vacuum/compact
    // guards) and pins that expiry touches only the old slice
    val keep = Seq((1L, 20L, "1970-01-02 06:00:00", "1970-01-02 18:00:00"))
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    IntervalIndexStore.build(iv.union(keep), dir, "user_id", "w_start", "w_end",
      bandSeconds = 86400L)
    val pts = Seq((100L, 1L, "1969-12-30 12:00:00"), (200L, 1L, "1970-01-02 12:00:00"))
      .toDF("event_id", "user_id", "t").select($"event_id", $"user_id",
        $"t".cast("timestamp").as("ts"))
    def matched() = IntervalIndexStore.lookup(spark, dir, pts, "ts")
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(matched() == Seq(100L, 200L))
    IntervalIndexStore.expire(spark, dir, java.sql.Timestamp.valueOf("1969-12-31 12:00:00"))
    assert(matched() == Seq(200L),
      "slice ending strictly before the cutoff still matched (floorDiv-shaped floor)")
  }

  test("vacuum refuses an expiry floor that covers the entire store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-allgone").toString
    val iv = Seq((1L, 10L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    IntervalIndexStore.build(iv, dir, "user_id", "w_start", "w_end",
      bandSeconds = 86400L)
    IntervalIndexStore.expire(spark, dir, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    val e = intercept[IllegalArgumentException](IntervalIndexStore.vacuum(spark, dir))
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // nothing was deleted: the store still reads (zero matches is fine)
    assert(IntervalIndexStore.audit(spark, dir).collect().head.getLong(0) == 0)
  }
}
