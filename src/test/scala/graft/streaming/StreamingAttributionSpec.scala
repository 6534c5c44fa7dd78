package graft.streaming

import graft.SparkSpec

/** The stream-stream interval join must (1) plan as a
  * StreamingSymmetricHashJoin with state-eviction watermarks derived
  * from the range condition — NOT get banded by RangeJoinRewrite, whose
  * streaming exemption exists precisely for this — and (2) drain to the
  * exact batch pair set. */
class StreamingAttributionSpec extends SparkSpec {

  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("attr-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming attribution pairs equal the batch interval join exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingAttribution
      .attributionPairs(graft.sources.Tables.normalizeEventTs(stream))
      .writeStream.format("memory").queryName("attr_pairs")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // the streaming plan is the symmetric hash join with both state
    // watermarks, not a banded/exploded rewrite
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.nonEmpty)
    val stateOps = progress.last.stateOperators
    assert(stateOps.nonEmpty && stateOps.exists(_.operatorName
      .toLowerCase.contains("symmetrichashjoin")),
      stateOps.map(_.operatorName).mkString(","))

    val streamed = spark.table("attr_pairs")
      .select($"view_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val batch = graft.operators.IntervalJoin.pointInInterval(
      purchases, views, key = "user_id", ts = "ts",
      start = "w_start", end = "w_end", bandSeconds = 3L * 86400L)
      .select($"i_view_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("restart from checkpoint resumes the join without duplicate or lost pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // time-ordered halves: the stream stops after half the data, then
    // restarts on the same checkpoint with the rest — buffered join
    // state must come back from the state store, and the file sink's
    // commit log must keep the output exactly-once.
    val events = graft.sources.Tables.events(spark, sfDir).orderBy($"ts")
    val n = events.count()
    val srcDir = java.nio.file.Files.createTempDirectory("attr-restart-src").toString
    val half = events.limit((n / 2).toInt).cache()
    half.coalesce(1).write.parquet(s"$srcDir/c0")
    val outDir = java.nio.file.Files.createTempDirectory("attr-restart-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("attr-restart-ckpt").toString
    val schema = spark.read.parquet(s"$srcDir/c0").schema

    def drainOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/c*")
      val q = StreamingAttribution
        .attributionPairs(graft.sources.Tables.normalizeEventTs(stream))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainOnce() // first half only
    events.exceptAll(half).coalesce(1).write.parquet(s"$srcDir/c1")
    half.unpersist()
    drainOnce() // restart: second half against restored join state

    val got = spark.read.parquet(outDir)
      .select($"view_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val batch = graft.operators.IntervalJoin.pointInInterval(
      purchases, views, key = "user_id", ts = "ts",
      start = "w_start", end = "w_end", bandSeconds = 3L * 86400L)
      .select($"i_view_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got.nonEmpty && got == batch,
      s"${got.size} pairs after restart vs ${batch.size} in batch")
  }

  test("left-outer streaming attribution drains to the exact batch outer join (unconverted views included)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingAttribution
      .attributionOuter(graft.sources.Tables.normalizeEventTs(stream))
      .writeStream.format("memory").queryName("attr_outer")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("attr_outer")
      .select($"view_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq

    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("v_ts"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user_id"),
        $"ts".as("p_ts"))
    val batch = views.join(purchases,
        views("user_id") === purchases("p_user_id") &&
          purchases("p_ts") >= views("v_ts") &&
          purchases("p_ts") <= views("v_ts") + expr("INTERVAL 3 DAY"),
        "left_outer")
      .select($"view_id", $"purchase_id", $"v_ts").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getTimestamp(2).getTime))
      .toSeq

    // Matched pairs emit eagerly: exact equality with the batch join.
    val streamedMatched = streamed.filter(_._2 != -1L)
    assert(streamedMatched.nonEmpty &&
      streamedMatched == batch.filter(_._2 != -1L).map(t => (t._1, t._2)).sorted)

    // Null-extensions only exist once the window is CONCLUSIVELY closed:
    // the final global watermark is min(max v_ts, max p_ts) − 1 h, and a
    // view's no-purchase verdict is final once watermark > v_ts + 3 d.
    // Views still open at end-of-input must NOT be null-extended (a live
    // stream would close them later); everything the watermark closed
    // must be. Boundary rows (window end == watermark exactly) would be
    // implementation-detail sensitive, but the event lattice makes exact
    // collisions measure-zero here; the ±0 margin below has held.
    val maxV = batch.map(_._3).max
    val maxPts = purchases.agg(max($"p_ts")).collect().head.getTimestamp(0).getTime
    val watermarkMs = math.min(maxV, maxPts) - 3600L * 1000L
    val closed = batch.filter(t => t._2 == -1L &&
      t._3 + 3L * 86400L * 1000L < watermarkMs).map(_._1).sorted
    val streamedUnmatched = streamed.filter(_._2 == -1L).map(_._1)
    assert(streamedUnmatched == closed,
      s"${streamedUnmatched.size} null-extended views vs ${closed.size} watermark-closed")
    assert(streamedUnmatched.nonEmpty, "no unconverted views in the drain")
  }

  test("attributionSink: crash AFTER a batch's write but BEFORE its commit stays exactly-once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Two source chunks + maxFilesPerTrigger=1 → at least two epochs.
    // The injected failure fires in epoch ≥1 in the exact window the
    // sink's idempotence exists for: files on disk, offset NOT
    // committed. The restart re-executes that epoch with the same
    // offsets and restored join state; its directory is OVERWRITTEN,
    // so the final table carries no duplicate and no loss.
    val events = graft.sources.Tables.events(spark, sfDir).orderBy($"ts")
    val n = events.count()
    val srcDir = java.nio.file.Files.createTempDirectory("attr-sink-src").toString
    val half = events.limit((n / 2).toInt).cache()
    half.coalesce(1).write.parquet(s"$srcDir/c0")
    events.exceptAll(half).coalesce(1).write.parquet(s"$srcDir/c1")
    half.unpersist()
    val outDir = java.nio.file.Files.createTempDirectory("attr-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("attr-sink-ckpt").toString
    val schema = spark.read.parquet(s"$srcDir/c0").schema

    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/c*")
      StreamingAttribution.attributionSink(
        StreamingAttribution.attributionPairs(
          graft.sources.Tables.normalizeEventTs(stream)),
        outDir, ckpt,
        afterWrite = id =>
          if (id >= 1 && crashArmed.getAndSet(false))
            throw new RuntimeException(s"injected crash after write of batch $id"))
    }

    val q1 = run()
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(crashed.getMessage.contains("injected crash"), crashed.getMessage)
    // non-vacuous: the crashed epoch's files ARE on disk (torn state)
    val tornDirs = new java.io.File(outDir).listFiles().count(_.getName.startsWith("batch="))
    assert(tornDirs >= 2, s"crash fired before the torn epoch wrote ($tornDirs dirs)")

    val q2 = run() // same checkpoint: replays the uncommitted epoch
    q2.awaitTermination()

    val got = StreamingAttribution.attributed(spark, outDir)
      .select($"view_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.distinct.size == got.size, "duplicate pairs after replay")
    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val batch = graft.operators.IntervalJoin.pointInInterval(
      purchases, views, key = "user_id", ts = "ts",
      start = "w_start", end = "w_end", bandSeconds = 3L * 86400L)
      .select($"i_view_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.sorted == batch.sorted,
      s"${got.size} pairs after crash+replay vs ${batch.size} in batch")
  }
}
