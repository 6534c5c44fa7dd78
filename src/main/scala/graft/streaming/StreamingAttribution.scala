package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-stream interval join: purchases attributed to every view
  * window they fall in, as the streams arrive — the streaming twin of
  * the batch attribution family (q63 library form, q151 planner-rewrite
  * form).
  *
  * Shape: both sides of the events stream are watermarked, and the join
  * carries the SAME point-in-interval condition the batch forms use
  * (`p.ts BETWEEN v.ts AND v.ts + window`). Spark plans this as a
  * StreamingSymmetricHashJoin keyed on user_id and — this is the part
  * that scales — derives join-state EVICTION from the range condition:
  * a buffered view is dropped once the purchase-side watermark passes
  * `view.ts + window` (no purchase can ever land in its window again),
  * and a buffered purchase once the view-side watermark passes its ts.
  * State is therefore bounded by (events inside the window horizon +
  * watermark delay), never by stream length.
  *
  * This is also why [[graft.plans.RangeJoinRewrite]] explicitly skips
  * streaming joins: the raw range conjuncts ARE the eviction contract.
  * Banding them into explode+equi-join would hide the bounds from the
  * watermark analysis — the batch rewrite and the streaming plan want
  * the same condition in two different forms, and each path gets its
  * own.
  *
  * Inner-join output is emitted eagerly per micro-batch (no watermark
  * wait), so an availableNow drain yields exactly the batch pair set —
  * StreamingAttributionSpec pins bit-parity against the banded batch
  * join on the same data.
  */
object StreamingAttribution {

  /** Attribution pairs from an events-shaped stream (event_id, ts,
    * user_id, event_type, value): one row per (view, purchase within
    * `windowDays` after it) for the same user.
    *
    * `watermark` bounds out-of-order arrival, exactly like the other
    * streaming twins. Pair output is deterministic per epoch (replayed
    * batches re-emit the same rows), which [[attributionSink]] turns
    * into an exactly-once table via idempotent per-epoch overwrites —
    * use it rather than hand-rolling a keyed sink. */
  def attributionPairs(events: DataFrame, windowDays: Int = 3,
      watermark: String = "1 hour"): DataFrame = {
    val views = events
      .where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    purchases
      .join(views,
        col("user_id") === col("v_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowDays DAY"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("p_ts"), col("value"))
  }

  /** LEFT OUTER streaming attribution — the real-time twin of batch
    * q153: EVERY view is emitted, matched views as they pair with
    * purchases, UNMATCHED views once their window has conclusively
    * closed. Spark's stream-stream left-outer join holds the preserved
    * (view) row in state until the purchase-side watermark passes
    * `view.ts + window` — only then can "no purchase arrived in the
    * window" be final — and emits the null-extended row at that
    * boundary. The batch planner rewrite bands this same shape; the
    * streaming plan instead derives its state eviction AND its
    * null-emission point from the raw range condition, which is why
    * [[graft.plans.RangeJoinRewrite]] exempts streaming joins.
    *
    * Columns: view_id, user_id, v_ts, purchase_id/p_ts/value
    * (NULL for unconverted views). An availableNow drain emits the
    * batch left-outer result for every window the FINAL watermark
    * closed; views whose window is still open at end-of-input stay
    * matched-only (their null-extension is not yet decidable — a live
    * stream closes them as later data arrives). The spec pins both
    * halves: matched pairs exactly, and null-extensions exactly for the
    * watermark-closed window set. */
  def attributionOuter(events: DataFrame, windowDays: Int = 3,
      watermark: String = "1 hour"): DataFrame = {
    val views = events
      .where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    views
      .join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowDays DAY"),
        "left_outer")
      .select(col("view_id"), col("user_id"), col("v_ts"),
        col("purchase_id"), col("p_ts"), col("value"))
  }

  /** The exactly-once sink surface the [[attributionPairs]] scaladoc
    * used to delegate to the caller, shipped as code: each micro-batch
    * OVERWRITES its own `batch=<epoch id>` directory under `path`.
    *
    * Why this is exactly-once under at-least-once replay: a crash
    * between the batch write and the checkpoint commit makes Spark
    * re-execute that epoch with the SAME source offsets against the
    * SAME restored join state, so the pair set it produces is
    * deterministic — and the overwrite replaces the partial/duplicate
    * directory instead of appending next to it. No (view_id,
    * purchase_id) dedup shuffle is needed on read; the key-set
    * uniqueness is a consequence of per-epoch determinism, which the
    * crash-mid-batch spec pins by injecting a failure exactly in the
    * write-committed/offset-uncommitted window. (The key-dedup
    * alternative pays a full shuffle on every read at 100 TB and still
    * cannot repair a torn multi-file append; directory-per-epoch
    * overwrite is the idempotence-by-construction shape, the same
    * pattern as the foreachBatch idempotent-write recipe in Spark's
    * structured-streaming docs.)
    *
    * `afterWrite` is the crash-injection seam for specs (called after
    * the batch's files are on disk, before the epoch commits); callers
    * ignore it. Read the result back with [[attributed]]. */
  def attributionSink(pairs: DataFrame, path: String,
      checkpointLocation: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterWrite: Long => Unit = _ => ()): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        afterWrite(batchId)
      }
      .trigger(trigger)
      .start()

  /** The attributed-pairs table a sink directory holds: the epoch
    * partitioning is an implementation detail, dropped here. */
  def attributed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")
}
