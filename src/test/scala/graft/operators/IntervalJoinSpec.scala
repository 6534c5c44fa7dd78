package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Banded point-in-interval join: inclusive boundaries, multi-band
  * intervals, NULL/degenerate handling, brute-force parity on real
  * events, and the plan shape (equi-join, not a nested loop). */
class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inclusive boundaries, per-key scoping, multi-band intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, 10L, ts("2026-01-01 00:00:00")), // exactly at start: in
      (2L, 10L, ts("2026-01-03 00:00:00")), // exactly at end: in
      (3L, 10L, ts("2026-01-03 00:00:01")), // just past end: out
      (4L, 20L, ts("2026-01-02 00:00:00")), // right time, wrong key: out
      (5L, 10L, ts("2026-01-02 12:00:00"))  // interior, crosses bands
    ).toDF("point_id", "key_id", "ts")
    val intervals = Seq(
      (10L, 100L, ts("2026-01-01 00:00:00"), ts("2026-01-03 00:00:00"))
    ).toDF("key_id", "ivl_id", "w_start", "w_end")
    // tiny band (1h) forces the interval across 49 bands; each matching
    // point must still appear exactly once
    val out = IntervalJoin.pointInInterval(points, intervals, "key_id",
      "ts", "w_start", "w_end", bandSeconds = 3600L)
      .select($"point_id", $"i_ivl_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq((1L, 100L), (2L, 100L), (5L, 100L)))
  }

  test("NULLs never match and degenerate intervals match nothing") {
    import spark.implicits._
    val points = Seq(
      (1L, Option(10L), Option(ts("2026-01-01 12:00:00"))),
      (2L, None, Option(ts("2026-01-01 12:00:00"))),
      (3L, Option(10L), None)
    ).toDF("point_id", "key_id", "ts")
    val intervals = Seq(
      (Option(10L), 100L, Option(ts("2026-01-01 00:00:00")), Option(ts("2026-01-02 00:00:00"))),
      (Option(10L), 101L, Option(ts("2026-01-02 00:00:00")), Option(ts("2026-01-01 00:00:00"))), // start > end
      (None, 102L, Option(ts("2026-01-01 00:00:00")), Option(ts("2026-01-02 00:00:00")))
    ).toDF("key_id", "ivl_id", "w_start", "w_end")
    val out = IntervalJoin.pointInInterval(points, intervals, "key_id",
      "ts", "w_start", "w_end", bandSeconds = 86400L)
      .select($"point_id", $"i_ivl_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)))
  }

  test("matches the naive non-equi join on real events (sf0.001)") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val got = IntervalJoin.pointInInterval(purchases, views, "user_id",
      "ts", "w_start", "w_end", bandSeconds = 3L * 86400L)
      .select($"event_id", $"i_view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = purchases.as("p").join(views.as("v"),
        $"p.user_id" === $"v.user_id" &&
          $"p.ts" >= $"v.w_start" && $"p.ts" <= $"v.w_end")
      .select($"p.event_id", $"v.view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("overlap join: inclusive, exactly-once across shared bands") {
    import spark.implicits._
    val a = Seq(
      (10L, 1L, ts("2026-01-01 00:00:00"), ts("2026-01-05 00:00:00")),
      (10L, 2L, ts("2026-01-06 00:00:00"), ts("2026-01-07 00:00:00"))
    ).toDF("key_id", "id_a", "w_start", "w_end")
    val b = Seq(
      (10L, 100L, ts("2026-01-03 00:00:00"), ts("2026-01-06 00:00:00")), // overlaps both
      (10L, 101L, ts("2026-01-05 00:00:00"), ts("2026-01-05 12:00:00")), // touches 1 at its end
      (10L, 102L, ts("2026-01-08 00:00:00"), ts("2026-01-09 00:00:00")), // overlaps none
      (20L, 103L, ts("2026-01-03 00:00:00"), ts("2026-01-06 00:00:00"))  // wrong key
    ).toDF("key_id", "id_b", "w_start", "w_end")
    // 1h bands: every interval spans dozens of bands; pairs still unique
    val out = IntervalJoin.intervalOverlap(a, b, "key_id", "w_start", "w_end",
      bandSeconds = 3600L, rightPrefix = "b_")
      .select($"id_a", $"b_id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq((1L, 100L), (1L, 101L), (2L, 100L)))
  }

  test("overlap join matches the naive non-equi self-join on real events (sf0.001)") {
    import spark.implicits._
    val views = graft.sources.Tables.events(spark, sfDir)
      .where($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 12 HOUR")).as("w_end"))
    val a = views.select($"user_id", $"event_id".as("id_a"), $"w_start", $"w_end")
    val b = views.select($"user_id", $"event_id".as("id_b"), $"w_start", $"w_end")
    val got = IntervalJoin.intervalOverlap(a, b, "user_id", "w_start", "w_end",
        bandSeconds = 12L * 3600L, rightPrefix = "b_")
      .where($"id_a" < $"b_id_b")
      .select($"id_a", $"b_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.as("x").join(b.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.id_a" < $"y.id_b" &&
          $"x.w_start" <= $"y.w_end" && $"y.w_start" <= $"x.w_end")
      .select($"x.id_a", $"y.id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("plans as an equi-join on (key, band), not a nested loop") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, sfDir)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val plan = IntervalJoin.pointInInterval(purchases, views, "user_id",
      "ts", "w_start", "w_end", bandSeconds = 3L * 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
