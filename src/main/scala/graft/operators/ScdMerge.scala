package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 dimension maintenance — the WRITE path the validity-interval
  * family reads from.
  *
  * q90 builds SCD2 history from a full event log and
  * [[IntervalIndexStore]]'s `openEnded` store serves lookups against
  * it; what was missing is the operational step in between: a standing
  * SCD2 table plus a batch of new change events, merged into the next
  * SCD2 table WITHOUT re-reading the event log (the reference's refresh
  * family — service_refresh.go:82-88 — is the same "standing table +
  * delta batch" discipline; this is its dimension-history form, the
  * MERGE INTO every warehouse runs nightly).
  *
  * Semantics ([[compress]] defines the target shape; [[applyChanges]]
  * is the incremental step and `applyChanges(compress(early), late) ==
  * compress(early ∪ late)` is spec- and oracle-pinned):
  *
  *  - only CHANGE POINTS open a row: a batch row whose tracked values
  *    NULL-safe-equal the key's current row is compressed away, so
  *    re-delivered extracts don't fabricate history;
  *  - an affected current row is CLOSED (`valid_to` = first new change
  *    ts) and the change opens the new current row (`valid_to` NULL);
  *  - closed history rows are NEVER touched — at 100 TB the dimension
  *    is stored partitioned by `is_current` and the merge reads ONLY
  *    the current partition, writes only closed+opened rows;
  *  - current rows whose key has no batch row pass through via a
  *    broadcast anti-join on the batch's key set (batch-sized), so the
  *    windowed merge work is proportional to the BATCH, never the
  *    dimension;
  *  - out-of-order input fails fast: a change at or before its key's
  *    current `valid_from` (other than an exact replay, which is
  *    dropped) would belong inside an already-closed interval — the
  *    merge raises with the key and timestamps named rather than
  *    silently corrupting history (the band-cap discipline of
  *    [[IntervalIndexStore.build]]).
  */
object ScdMerge {

  /** Compress an event stream into SCD2 rows: one row per run of equal
    * tracked values per key, `valid_from` = first ts of the run,
    * `valid_to` = next run's start (NULL on the current row).
    *
    * `values` are the tracked (compared) columns; `carry` columns ride
    * along from the FIRST row of each run without being compared (a
    * surrogate event id, a source lineage tag) and break ordering ties
    * at equal `ts`, so the result is deterministic when they are.
    *
    * One hash partition by `key`: both window passes share the same
    * partitioning and sort, so Catalyst plans a single exchange. */
  def compress(events: DataFrame, key: String, ts: String,
      values: Seq[String], carry: Seq[String] = Nil): DataFrame = {
    require(values.nonEmpty, "at least one tracked value column")
    val ord = (col(ts).asc +: carry.map(col(_).asc))
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
    // row_number, not lag(value)-is-null: a legitimately-NULL first
    // value would NULL-safe-equal its missing predecessor and the
    // key's first row would vanish
    val changed = values
      .map(v => !(col(v) <=> lag(col(v), 1).over(w)))
      .reduce(_ || _)
    // window expressions can't live in a WHERE clause: project the keep
    // verdict first, filter second (both windows still share one
    // exchange+sort — same partitioning, same ordering)
    val runs = events
      .withColumn("__keep", row_number().over(w) === 1 || changed)
      .where(col("__keep"))
      .drop("__keep")
    val w2 = Window.partitionBy(col(key)).orderBy(ord: _*)
    runs
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(key) +: values.map(col) ++: carry.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Apply a change batch to a standing SCD2 table (the output shape of
    * [[compress]]). Returns the next SCD2 table: closed history
    * verbatim, untouched current rows verbatim, and each affected key's
    * current row re-derived together with its batch changes.
    *
    * Replay convergence: a key whose batch rows include an EXACT match
    * of its current row (same ts, NULL-safe-equal tracked values) is
    * recognized as a re-delivery — that row and every older row of the
    * key are dropped, so re-applying a whole batch to the
    * already-merged table is a no-op even when the batch carried
    * several changes per key. Without that marker, anything at or
    * before the current `valid_from` raises — see the object scaladoc.
    * (A genuinely out-of-order row that arrives in the same batch as a
    * coincidental exact replay of its key is indistinguishable from
    * the replayed prefix and is dropped with it; label-level
    * idempotence — [[ScdStore.applyBatch]] — removes even that corner.) */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      ts: String, values: Seq[String], carry: Seq[String] = Nil,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    val history = base.where(col("valid_to").isNotNull)
    val (closedDelta, newCurrent) = mergeParts(
      base.where(col("valid_to").isNull), changes, key, ts, values, carry,
      materialize)
    history.unionByName(closedDelta).unionByName(newCurrent)
  }

  /** The merge split by WRITE DESTINATION — what an incremental store
    * actually persists per batch: `closedDelta` (rows this batch closed
    * — history APPEND) and `newCurrent` (the next current partition —
    * the only rewrite). Closed history never appears here at all; the
    * caller's history data is untouched by construction, not by
    * convention. [[applyChanges]] is this plus the history union. */
  def mergeParts(current: DataFrame, changes: DataFrame, key: String,
      ts: String, values: Seq[String], carry: Seq[String] = Nil,
      materialize: DataFrame => DataFrame = identity)
      : (DataFrame, DataFrame) = {
    require(values.nonEmpty, "at least one tracked value column")
    val batchKeys = changes.select(col(key)).where(col(key).isNotNull).distinct()
    val untouched = current.join(broadcast(batchKeys), Seq(key), "left_anti")
    val touched = current.join(broadcast(batchKeys), Seq(key), "left_semi")

    def vals(prefix: String = ""): Column =
      struct(values.map(v => col(s"$prefix$v")): _*)
    val cur = touched.select(col(key).as("__ckey"),
      col("valid_from").as("__cur_from"), vals().as("__cur_vals"))
    val replay = col(ts) === col("__cur_from") && (vals() <=> col("__cur_vals"))
    // a key is RE-DELIVERED when its batch contains an exact copy of
    // the current row: the current row was derived from this batch, so
    // the key's rows at or before it are the already-applied prefix
    val redelivered = max(when(coalesce(replay, lit(false)), 1).otherwise(0))
      .over(Window.partitionBy(col(key))) === 1
    // the guard rides INSIDE the ts the merge consumes (a free-standing
    // check column would be pruned away); new keys have no current row,
    // so __cur_from is NULL and the guard passes. NULL key/ts rows are
    // NOT silently dropped — a lost change corrupts the dimension as
    // surely as a mis-ordered one, so both fail fast.
    val guardedTs = when(col(key).isNull || col(ts).isNull,
      raise_error(concat(
        lit("SCD2 change with NULL "), lit(s"$key/$ts"),
        lit(" (key="), coalesce(col(key).cast("string"), lit("NULL")),
        lit("): every change must address a key at a time")))
        .cast(changes.schema(ts).dataType))
      .when(
        col("__cur_from").isNotNull && col(ts) <= col("__cur_from"),
        raise_error(concat(
          lit("out-of-order SCD2 change for key "), col(key).cast("string"),
          lit(": change ts "), col(ts).cast("string"),
          lit(" is at or before the current row's valid_from "),
          col("__cur_from").cast("string"),
          lit(" (and the key is not a re-delivery); rebuild the key from the log")))
          .cast(changes.schema(ts).dataType))
      .otherwise(col(ts))
    val accepted = changes
      .join(cur, col(key) <=> col("__ckey"), "left")
      .withColumn("__drop",
        // coalesce: a NULL-ts row must fall through to the raise below,
        // not vanish inside a redelivered key's dropped prefix
        redelivered && coalesce(col(ts) <= col("__cur_from"), lit(false)))
      .where(!col("__drop"))
      .withColumn(ts, guardedTs)
      .select((col(key) +: values.map(col) ++: carry.map(col)) :+ col(ts): _*)
    // the current row re-enters as the oldest pseudo-change of its key
    // (its ts is strictly below every accepted change, per the guard),
    // so compress re-derives the run structure exactly as a full
    // rebuild over (current ∪ batch) would
    val pseudo = touched
      .select((col(key) +: values.map(col) ++: carry.map(col)) :+
        col("valid_from").as(ts): _*)
      .unionByName(accepted)
    // both returned parts filter the SAME merged frame; `materialize`
    // (e.g. localCheckpoint in ScdStore) lets a caller that consumes
    // both pin the windowed merge to one execution instead of two
    val merged = materialize(compress(pseudo, key, ts, values, carry))
    (merged.where(col("valid_to").isNotNull),
      untouched.unionByName(merged.where(col("valid_to").isNull)))
  }

  /** q159: SCD2 MERGE parity — the standing per-user state table built
    * from the log's first half, merged with the second half as the
    * change batch. The oracle compresses the FULL log in one pass, so a
    * green hash proves `applyChanges(compress(early), late) ==
    * compress(all)`: the incremental path is semantically invisible,
    * the same bar q156/q157 hold the stores to. */
  def q159Scd2Merge(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("2024-01-16").cast("timestamp")
    val f = graft.sources.Tables.events(spark, d)
      .where($"event_type" === "signup" || $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"event_type", $"ts")
    // Optimization r17 (guide §3.3/§5): the standing table is consumed
    // FOUR times downstream (history split, untouched/touched anti/semi,
    // and the current-row pseudo-changes), and the windowed merge twice
    // (closed vs current split) — without a materialization each
    // consumer re-ran the whole window-compress lineage (21 Exchanges in
    // the before-plan). localCheckpoint pins each to ONE execution per
    // invocation; nothing survives the invocation, so every bench reps
    // still computes from the parquet inputs. This is exactly the
    // `materialize` seam ScdStore already uses in production
    // (ScdStore.applyBatch passes localCheckpoint here too).
    val base = compress(f.where($"ts" < cutoff), key = "user_id",
      ts = "ts", values = Seq("event_type"), carry = Seq("event_id"))
      .localCheckpoint()
    applyChanges(base, f.where($"ts" >= cutoff), key = "user_id",
      ts = "ts", values = Seq("event_type"), carry = Seq("event_id"),
      materialize = _.localCheckpoint())
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  /** q159's DuckDB oracle: change-aware SCD2 over the WHOLE log — runs
    * keyed by consecutive distinct `event_type`, first event of each
    * run carried. */
  val q159Sql: String =
    """WITH f AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('signup', 'purchase')
      |), c AS (
      |  SELECT user_id, event_id, event_type, ts,
      |         row_number() OVER w AS rn,
      |         lag(event_type) OVER w AS prev
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), p AS (
      |  SELECT user_id, event_id, event_type, ts FROM c
      |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
      |)
      |SELECT user_id, event_type, event_id,
      |       ts AS valid_from,
      |       lead(ts, 1) OVER w AS valid_to,
      |       (lead(ts, 1) OVER w IS NULL) AS is_current
      |FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, valid_from, event_id""".stripMargin
}
