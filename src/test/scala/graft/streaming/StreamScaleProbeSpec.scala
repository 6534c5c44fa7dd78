package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.sources.Tables

/** Streaming twins at the 10× probe scale (tools/gen_scale_probe.py —
  * same gating as ScaleProbeSpec). The batch suite's probe measures
  * plan-shape and runtime ratios; the stateful streaming operators need
  * DIFFERENT evidence: that a full drain of the 10× stream completes,
  * what its throughput is, and that the state store stays bounded by
  * the operator's declared invariant (shards / event types / open
  * sessions) rather than growing with stream length.
  *
  * Each drain runs the 10× feed as an availableNow file stream split
  * into time-ordered chunk files (one file per micro-batch via
  * maxFilesPerTrigger=1 — multi-batch state folding is the whole
  * point). Peak state rows come from the engine's own
  * StreamingQueryProgress state-operator metrics. Results print as
  * `STREAMPROBE |` rows — the source of SCALE.md's streaming table.
  */
class StreamScaleProbeSpec extends SparkSpec {

  private val probeDir =
    sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")

  private def gate(): Unit =
    // self-generating fixture (ScaleProbeGen): only an absent SOURCE
    // dir can cancel these now — a missing probe dir is built on the
    // spot, so clean-environment `sbt test` asserts instead of skipping
    assume(graft.util.ScaleProbeGen.ensure(spark, "/root/testdata/sf0.1",
      probeDir),
      s"source dir /root/testdata/sf0.1 absent — cannot build $probeDir")

  private val nChunks = 8

  /** Stage a table into `nChunks` sequential single-file chunks so an
    * availableNow drain runs nChunks micro-batches in order. `chunkOf`
    * must be monotone in whatever arrival order the operator under test
    * assumes (event time for the sessionizer/anomaly contract). */
  private def stageChunks(df: DataFrame, chunkCol: org.apache.spark.sql.Column,
      tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"sprobe-$tag").toString
    val chunked = df.withColumn("__c", chunkCol)
    // sequential writes: ascending file mod-times give the file stream
    // the intended batch order (FileStreamSource sorts by timestamp)
    (0 until nChunks).foreach { i =>
      chunked.where(col("__c") === i).drop("__c")
        .coalesce(1).write.parquet(s"$dir/c$i")
    }
    dir
  }

  private lazy val probeEvents: DataFrame =
    Tables.normalizeEventTs(spark.read.parquet(s"$probeDir/events.parquet"))

  /** Events split into equal event-time slices — chunk i's rows all
    * precede chunk i+1's, the time-ordered-arrival contract. */
  private lazy val eventChunkDir: String = {
    val b = probeEvents.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val width = (hi - lo) / nChunks + 1
    stageChunks(probeEvents, ((unix_micros(col("ts")) - lo) / width).cast("int"),
      "events")
  }

  private lazy val docChunkDir: String = {
    val docs = spark.read.parquet(s"$probeDir/documents.parquet")
    val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    stageChunks(docs, (col("doc_id") * nChunks / n).cast("int"), "docs")
  }

  private case class Drain(rows: Long, secs: Double, peakState: Long,
      batches: Long)

  private def drain(name: String, srcDir: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Append): Drain = {
    val schema = spark.read.parquet(s"$srcDir/c0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/c*")
    val t0 = System.nanoTime()
    val q = transform(stream).writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress
    Drain(
      rows = progs.map(_.numInputRows).sum,
      secs = secs,
      peakState = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max),
      batches = progs.count(_.numInputRows > 0).toLong)
  }

  private def report(op: String, d: Drain, stateBound: String): Unit =
    println(f"STREAMPROBE | $op | ${d.rows}%,d rows | ${d.batches} batches | " +
      f"${d.secs}%.1f s | ${d.rows / d.secs}%,.0f rows/s | " +
      f"peak state ${d.peakState}%,d | bound: $stateBound")

  test("10x sessionAssignments drains; state bounded by users with open sessions") {
    gate()
    import spark.implicits._
    val users = probeEvents.select(countDistinct(col("user_id"))).head().getLong(0)
    val total = probeEvents.count()
    val d = drain("sprobe_sessions", eventChunkDir,
      df => EventStreams.sessionAssignments(
        Tables.normalizeEventTs(df).as[EventStreams.Event]).toDF())
    report("sessionAssignments", d, s"open-session users <= $users distinct users")
    assert(d.rows == total, s"drain incomplete: ${d.rows} of $total")
    assert(d.peakState > 0 && d.peakState <= users,
      s"session state ${d.peakState} exceeds distinct users $users")
    // Emitted labels are CLOSED sessions only — never more than events.
    val emitted = spark.table("sprobe_sessions").count()
    assert(emitted <= total)
  }

  test("10x heavy hitters: state is nShards sketch rows regardless of volume") {
    gate()
    import spark.implicits._
    val d = drain("sprobe_hh", docChunkDir,
      df => StreamingHeavyHitters.sketchStream(
        df.select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token")).where(col("token") =!= "").as[String],
        nShards = 8, capacity = 64).toDF(),
      OutputMode.Update)
    report("heavyHitters(tokens of docs)", d, "8 shard rows, any volume")
    // THE Misra–Gries point: state rows == shard count, not vocabulary.
    assert(d.peakState <= 8, s"MG state ${d.peakState} rows > nShards")
    assert(d.batches == nChunks)
  }

  test("10x rate anomaly: state is one row per event type") {
    gate()
    val types = probeEvents.select(countDistinct(col("event_type")))
      .head().getLong(0)
    val total = probeEvents.count()
    val d = drain("sprobe_anomaly", eventChunkDir,
      df => StreamingAnomaly.rateAnomalyStream(
        Tables.normalizeEventTs(df)).toDF())
    report("rateAnomaly", d, s"$types event-type rows")
    assert(d.rows == total)
    assert(d.peakState <= types,
      s"anomaly state ${d.peakState} rows > $types event types")
  }

  test("10x streaming attribution: join state evicts behind the watermark") {
    gate()
    // The stream-stream interval join's scale claim is that buffered
    // state is bounded by the window horizon (3 days) + watermark delay
    // behind the advancing event-time frontier — NOT by stream length.
    // Draining in 8 time-ordered chunks advances the watermark between
    // batches, so rows older than (frontier - horizon) must be GONE from
    // the state store by the final batch.
    val d = drain("sprobe_attr", eventChunkDir,
      df => StreamingAttribution.attributionPairs(
        Tables.normalizeEventTs(df), windowDays = 3, watermark = "1 hour"))
    val views = probeEvents.where(col("event_type") === "view").count()
    val purchases = probeEvents.where(col("event_type") === "purchase").count()
    val joinInput = views + purchases
    report("attributionPairs(3d window)", d,
      s"events within 3d+1h of the watermark frontier (<= $joinInput join-side rows)")
    assert(d.batches == nChunks)
    // Eviction evidence: the events span ~months, so one 3-day horizon
    // holds well under half the join input; without eviction peak state
    // would approach joinInput as the last batch lands.
    assert(d.peakState > 0, "no join state recorded — not a stateful join?")
    assert(d.peakState < joinInput / 2,
      s"join state ${d.peakState} ~ stream size $joinInput: eviction not firing")
    // Pair output equals the batch banded join on the same 10x data.
    val batchPairs = {
      import spark.implicits._
      val v = probeEvents.where($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
          ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
      val p = probeEvents.where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      graft.operators.IntervalJoin.pointInInterval(p, v, key = "user_id",
        ts = "ts", start = "w_start", end = "w_end",
        bandSeconds = 3L * 86400L).count()
    }
    assert(spark.table("sprobe_attr").count() == batchPairs)
  }

  test("10x left-outer streaming attribution: preserved-side state still evicts") {
    gate()
    // The outer twin buffers every VIEW until its window conclusively
    // closes (that's where the null-extension verdict comes from), so
    // the eviction claim matters MORE here than for the inner join: an
    // unbounded implementation would hold every view forever. Peak
    // state must stay a window-horizon slice, and the drained output
    // must carry the inner pair set plus one null-extension per
    // watermark-closed unconverted view.
    val d = drain("sprobe_attr_outer", eventChunkDir,
      df => StreamingAttribution.attributionOuter(
        Tables.normalizeEventTs(df), windowDays = 3, watermark = "1 hour"))
    val views = probeEvents.where(col("event_type") === "view").count()
    val purchases = probeEvents.where(col("event_type") === "purchase").count()
    val joinInput = views + purchases
    report("attributionOuter(3d window)", d,
      s"window-horizon slice (<= $joinInput join-side rows)")
    assert(d.peakState > 0 && d.peakState < joinInput / 2,
      s"outer join state ${d.peakState} ~ stream size $joinInput: eviction not firing")
    val out = spark.table("sprobe_attr_outer")
    val matched = out.where(col("purchase_id").isNotNull).count()
    val unmatched = out.where(col("purchase_id").isNull).count()
    val batchPairs = {
      import spark.implicits._
      val v = probeEvents.where($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
          ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
      val p = probeEvents.where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      graft.operators.IntervalJoin.pointInInterval(p, v, key = "user_id",
        ts = "ts", start = "w_start", end = "w_end",
        bandSeconds = 3L * 86400L).count()
    }
    assert(matched == batchPairs,
      s"outer drain matched $matched pairs vs batch $batchPairs")
    assert(unmatched > 0, "no watermark-closed unconverted views at 10x")
    assert(matched + unmatched == out.count())
  }

  test("10x streaming LM scoring drains against a 10x standing store") {
    gate()
    val storeDir = java.nio.file.Files.createTempDirectory("sprobe-lmstore").toString
    val scoresDir = java.nio.file.Files.createTempDirectory("sprobe-scores").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sprobe-ckpt").toString
    val docs = spark.read.parquet(s"$probeDir/documents.parquet")
    val tBuild0 = System.nanoTime()
    graft.operators.CorpusStatsStore.build(docs, storeDir)
    val buildSecs = (System.nanoTime() - tBuild0) / 1e9
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[StreamingLmScore.ScoreReport]
    val schema = spark.read.parquet(s"$docChunkDir/c0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$docChunkDir/c*")
    val t0 = System.nanoTime()
    val q = StreamingLmScore.start(stream, storeDir, scoresDir, ckpt,
      r => reports.synchronized { reports += r })
    // foreachBatch sinks don't self-terminate under the default trigger;
    // availableNow semantics come from draining then stopping.
    q.processAllAvailable()
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val scored = reports.map(_.docs).sum
    val total = docs.count()
    println(f"STREAMPROBE | lmScore(fluencyAgainst store) | $scored%,d docs | " +
      f"${reports.size} batches | $secs%.1f s | ${scored / secs}%,.0f docs/s | " +
      f"store build $buildSecs%.1f s | state: none (store-backed)")
    assert(scored == total, s"scored $scored of $total docs")
    assert(reports.map(_.version).distinct == Seq(1),
      "every batch must report the pinned store version")
  }
}
