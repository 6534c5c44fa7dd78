package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * streaming twins; at-least-once replays are the caller's concern
    * (pair output is deterministic, so replayed batches re-emit the
    * same rows — route through a keyed sink or `dropDuplicates` on
    * (view_id, purchase_id) for exactly-once surfaces). */
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
}
