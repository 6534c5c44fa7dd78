package graft.streaming

import graft.SparkSpec

/** Streaming transforms via availableNow file streams: results must
  * match the same transforms run in batch mode (watermark passes
  * everything once the stream drains). */
class EventStreamsSpec extends SparkSpec {

  // File-stream sources must be directories; stage the single-file
  // events table into one.
  private lazy val src: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("windowed counts: streaming availableNow equals batch") {
    import org.apache.spark.sql.functions._
    // Complete mode: append would hold back the newest windows (the
    // watermark never passes the stream's max event time).
    val streamed = EventStreams.runAvailableNow(spark, src,
      df => EventStreams.windowedCounts(
        graft.sources.Tables.normalizeEventTs(df)),
      "wc_stream", org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = EventStreams.windowedCounts(graft.sources.Tables.events(spark, sfDir))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
    assert(s.nonEmpty)
  }

  test("session windows produce per-user sessions with positive spans") {
    import org.apache.spark.sql.functions._
    val out = EventStreams.runAvailableNow(spark, src,
      df => EventStreams.sessionWindows(
        graft.sources.Tables.normalizeEventTs(df)),
      "sess_stream")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("session_start")
        .before(r.getAs[java.sql.Timestamp]("session_end")))
      assert(r.getAs[Long]("n_events") >= 1)
    }
  }

  test("streaming dedup collapses a replayed feed to distinct event ids") {
    import org.apache.spark.sql.functions._
    // Stage the events file TWICE — an at-least-once replay where every
    // event arrives exactly two times.
    val dir = java.nio.file.Files.createTempDirectory("events-replay")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-b.parquet"))
    val deduped = EventStreams.runAvailableNow(spark, dir.toString,
      df => EventStreams.dedupedEvents(
        graft.sources.Tables.normalizeEventTs(df)),
      "dedup_stream")
    val batchDistinct = graft.sources.Tables.events(spark, sfDir)
      .select("event_id").distinct().count()
    assert(deduped.count() == batchDistinct)
    assert(deduped.select("event_id").distinct().count() == batchDistinct)
  }

  test("stream-stream interval join equals the batch join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.runAvailableNow(spark, src,
      df => EventStreams.purchaseAttribution(
        graft.sources.Tables.normalizeEventTs(df)),
      "ssj_stream")
    val batch = EventStreams.purchaseAttribution(
      graft.sources.Tables.events(spark, sfDir))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
    assert(s.nonEmpty)
    // every joined view is within the 1h window before its purchase
    batch.collect().foreach { r =>
      val p = r.getAs[java.sql.Timestamp]("ts")
      val v = r.getAs[java.sql.Timestamp]("view_ts")
      assert(!v.after(p))
      assert(p.getTime - v.getTime <= 3600 * 1000L)
    }
  }

  test("streaming sessionize: closed sessions carry exactly the batch q112 labels") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import EventStreams._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
    // two time-ordered files → two micro-batches: batch 2's watermark
    // (max ts of batch 1) closes batch-1 sessions by event-time timeout,
    // and batch-2 events close their predecessors by gap detection
    val Array(loUs, hiUs) = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val midUs = loUs + (hiUs - loUs) / 2
    val dir = java.nio.file.Files.createTempDirectory("events-sess")
    ev.where(unix_micros($"ts") <= midUs).coalesce(1)
      .write.parquet(dir.resolve("t=a").toString)
    Thread.sleep(1100) // file-source ordering is by modification time
    ev.where(unix_micros($"ts") > midUs).coalesce(1)
      .write.parquet(dir.resolve("t=b").toString)

    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("basePath", dir.toString)
      .parquet(dir.toString + "/t=*")
    val q = sessionAssignments(stream.as[Event], gapMinutes = 30,
        watermark = "0 seconds")
      .toDF()
      .writeStream.format("memory").queryName("sess_assign")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sess_assign").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed.nonEmpty)

    val batch = graft.queries.Streams.q112Sessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    // every closed session's labels match the batch query bit-for-bit
    val closedKeys = streamed.map(t => (t._2, t._3))
    val batchClosed = batch.filter(t => closedKeys.contains((t._2, t._3)))
    assert(streamed == batchClosed)
    // closed sessions are a time-prefix per user: ordinals 1..k contiguous
    streamed.groupBy(_._2).foreach { case (_, rows) =>
      val sessIds = rows.map(_._3)
      assert(sessIds == (1L to sessIds.max).toSet)
    }
  }

  test("transformWithState running totals converge to the batch aggregate") {
    import spark.implicits._
    import EventStreams._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = EventStreams.runAvailableNow(spark, src,
        df => userActivityTws(
          graft.sources.Tables.normalizeEventTs(df)
            .selectExpr("event_id", "ts", "user_id", "event_type", "value")
            .as[Event]).toDF(),
        "tws_stream", org.apache.spark.sql.streaming.OutputMode.Update())
      // Update mode emits one row per (user, batch); the final row per
      // user (max n_events) must equal the batch group aggregate.
      val finals = out.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      val batch = graft.sources.Tables.events(spark, sfDir)
        .selectExpr("user_id", "value").collect()
        .groupBy(_.getLong(0))
      assert(finals.size == batch.size)
      finals.foreach { case (u, (_, n, total)) =>
        assert(n == batch(u).length.toLong)
        assert(math.abs(total - batch(u).map(_.getDouble(1)).sum) < 1e-6)
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("mapGroupsWithState accumulates per-user counters across batches") {
    import spark.implicits._
    import EventStreams._
    val events = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    // Batch Dataset path exercises the same typed group logic.
    val acts = events.groupByKey(_.user_id)
      .mapGroups { (u, it) =>
        val rows = it.toSeq
        UserActivity(u, rows.size.toLong, rows.map(_.value).sum)
      }.collect()
    val expected = events.collect().groupBy(_.user_id)
    assert(acts.length == expected.size)
    acts.foreach { a =>
      assert(a.n_events == expected(a.user_id).length.toLong)
    }
  }
}
