package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Anomaly

/** Closed buckets from the streaming rate-anomaly detector must equal
  * the batch operator bit-for-bit (the q112 sessionization parity
  * discipline applied to q126). */
class StreamingAnomalySpec extends SparkSpec {

  test("med2 matches the sorted-frame integer median") {
    assert(StreamingAnomaly.med2Of(Nil).isEmpty)
    assert(StreamingAnomaly.med2Of(Seq(7L)).contains(14L))
    assert(StreamingAnomaly.med2Of(Seq(3L, 9L)).contains(12L))
    assert(StreamingAnomaly.med2Of(Seq(9L, 1L, 5L)).contains(10L))
    assert(StreamingAnomaly.med2Of(Seq(4L, 2L, 8L, 6L)).contains(10L))
  }

  test("streaming closed buckets equal batch rows across two micro-batches") {
    import spark.implicits._
    // 40 steady hours of 10, a 100-event spike at hour 40, 5 more steady
    val base = (0 until 40).flatMap(h => Seq.fill(10)(h.toLong)) ++
      Seq.fill(100)(40L) ++ (41 until 46).flatMap(h => Seq.fill(10)(h.toLong))
    val rows = base.zipWithIndex.map { case (h, i) =>
      (i.toLong,
        java.sql.Timestamp.valueOf(f"2025-01-${h / 24 + 1}%02d ${h % 24}%02d:15:00"),
        "click")
    }
    val dir = java.nio.file.Files.createTempDirectory("sanom").toString
    // time-ordered split: first 30 hours, then the rest
    val (b1, b2) = rows.partition(_._2.getTime <
      java.sql.Timestamp.valueOf("2025-01-02 06:00:00").getTime)
    b1.toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(s"$dir/f=1")
    b2.toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(s"$dir/f=2")

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f=*")
    val q = StreamingAnomaly.rateAnomalyStream(stream)
      .writeStream.format("memory").queryName("sanom_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("sanom_out")
      .select($"event_type", $"hour", $"n_events", $"med2", $"n_trail", $"is_spike")
      .collect().map(_.toSeq).toSet
    val batchDf = Anomaly.rateAnomalyOf(rows.toDF("event_id", "ts", "event_type"))
    // the stream can't judge each type's final (still-open) bucket
    val lastHour = batchDf.agg(max($"hour")).head().getTimestamp(0)
    val batch = batchDf.where($"hour" < lastHour)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"only-stream=${(streamed diff batch).take(3)} only-batch=${(batch diff streamed).take(3)}")
    val spikes = streamed.filter(r => r(5) == true)
    assert(spikes.size == 1 && spikes.head(2) == 100L)
  }

  test("late events for a closed bucket are dropped and counted, never re-emitted") {
    import spark.implicits._
    // micro-batch 1: hours 0..2 (closes 0 and 1); micro-batch 2: one
    // LATE event for hour 0 plus hour 3 (closes hour 2). The late event
    // must not re-open hour 0 — no duplicate (type, hour) row, and hour
    // 2's count stays 5, not polluted by a re-opened partial bucket.
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")
    val b1 = (0 to 2).flatMap(h => (0 until 5).map(m => (ts(h, m), "click")))
    val b2 = Seq((ts(0, 30), "click")) ++ (0 until 5).map(m => (ts(3, m), "click"))
    val dir = java.nio.file.Files.createTempDirectory("sanom-late").toString
    b1.toDF("ts", "event_type").coalesce(1).write.parquet(s"$dir/f=1")
    b2.toDF("ts", "event_type").coalesce(1).write.parquet(s"$dir/f=2")
    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f=*")
    val q = StreamingAnomaly.rateAnomalyStream(stream)
      .writeStream.format("memory").queryName("sanom_late")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("sanom_late")
      .select($"hour", $"n_events").as[(java.sql.Timestamp, Long)].collect().toSeq
    // one row per closed hour, every count exactly 5 — the late event
    // neither duplicated hour 0 nor leaked into any other bucket
    assert(out.map(_._1).distinct.size == out.size, out.toString)
    assert(out.toSet == Set((ts(0, 0), 5L), (ts(1, 0), 5L), (ts(2, 0), 5L)), out.toString)
  }
}
