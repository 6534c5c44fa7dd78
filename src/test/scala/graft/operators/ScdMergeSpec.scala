package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SCD2 merge must be semantically invisible: applying a change
  * batch to a compressed base equals compressing the whole log in one
  * pass — on real data, on seeded random data, and under replay. The
  * scale posture (history untouched, untouched keys via broadcast
  * anti-join, window work batch-proportional) is pinned on the physical
  * plan, and out-of-order input must fail fast, not corrupt history. */
class ScdMergeSpec extends SparkSpec {

  import ScdMerge._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def df(rows: Seq[(Long, Long, String, Timestamp)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ts")
  }

  private def rows(d: DataFrame): Seq[(Long, String, Long, Timestamp, Option[Timestamp], Boolean)] = {
    import spark.implicits._
    d.select($"user_id", $"event_type", $"event_id", $"valid_from",
        $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._4.getTime, t._3)).toSeq
  }

  test("compress keeps change points only and chains validity") {
    val log = df(Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (1L, 2L, "a", ts("2024-01-02 00:00:00")), // same value: compressed away
      (1L, 3L, "b", ts("2024-01-03 00:00:00")),
      (2L, 4L, "x", ts("2024-01-01 12:00:00"))))
    val got = rows(compress(log, "user_id", "ts", Seq("event_type"), Seq("event_id")))
    assert(got == Seq(
      (1L, "a", 1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "b", 3L, ts("2024-01-03 00:00:00"), None, true),
      (2L, "x", 4L, ts("2024-01-01 12:00:00"), None, true)))
  }

  test("a NULL first value survives compression") {
    import spark.implicits._
    val log = Seq((1L, 1L, Option.empty[String], ts("2024-01-01 00:00:00")),
        (1L, 2L, Some("a"), ts("2024-01-02 00:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = compress(log, "user_id", "ts", Seq("event_type"), Seq("event_id"))
    assert(got.count() == 2, "the key's NULL-valued first run must be kept")
  }

  test("merge equals one-pass compression over the full log (events data)") {
    import spark.implicits._
    val f = graft.sources.Tables.events(spark, sfDir)
      .where($"event_type" === "signup" || $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"event_type", $"ts")
    val cut = lit("2024-01-16").cast("timestamp")
    val base = compress(f.where($"ts" < cut), "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    val merged = applyChanges(base, f.where($"ts" >= cut), "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    val full = compress(f, "user_id", "ts", Seq("event_type"), Seq("event_id"))
    assert(rows(merged).nonEmpty && rows(merged) == rows(full))
  }

  test("merge equals one-pass compression on seeded random logs") {
    import spark.implicits._
    for (seed <- Seq(7L, 23L, 91L)) {
      val rnd = new scala.util.Random(seed)
      val log = df((1L to 400L).map { i =>
        (rnd.nextInt(12).toLong, i,
          s"v${rnd.nextInt(3)}",
          new Timestamp(1700000000000L + rnd.nextInt(2000000) * 1000L))
      })
      // distinct ts per key so the early/late split is well-defined
      val dedup = log.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id", $"ts").orderBy($"event_id")))
        .where($"rn" === 1).drop("rn")
      val cut = lit(new Timestamp(1700000000000L + 1000000 * 1000L))
      val base = compress(dedup.where($"ts" < cut), "user_id", "ts",
        Seq("event_type"), Seq("event_id"))
      val merged = applyChanges(base, dedup.where($"ts" >= cut), "user_id",
        "ts", Seq("event_type"), Seq("event_id"))
      val full = compress(dedup, "user_id", "ts", Seq("event_type"), Seq("event_id"))
      assert(rows(merged) == rows(full), s"seed $seed diverged")
    }
  }

  test("empty batch is the identity") {
    val base = compress(df(Seq((1L, 1L, "a", ts("2024-01-01 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val got = applyChanges(base, df(Nil), "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    assert(rows(got) == rows(base))
  }

  test("re-applying a batch to the merged table converges (replay no-op)") {
    val base = compress(df(Seq((1L, 1L, "a", ts("2024-01-01 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val batch = df(Seq((1L, 2L, "b", ts("2024-01-05 00:00:00")),
      (2L, 3L, "x", ts("2024-01-06 00:00:00"))))
    val once = applyChanges(base, batch, "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    val twice = applyChanges(once, batch, "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    assert(rows(twice) == rows(once))
  }

  test("re-applying a batch with SEVERAL changes per key converges too") {
    val base = compress(df(Seq((1L, 1L, "a", ts("2024-01-01 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val batch = df(Seq(
      (1L, 2L, "b", ts("2024-01-03 00:00:00")),
      (1L, 3L, "c", ts("2024-01-05 00:00:00")),
      (1L, 4L, "d", ts("2024-01-07 00:00:00"))))
    val once = applyChanges(base, batch, "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    // at-least-once redelivery of the whole batch: the key's exact
    // current-row copy marks it re-delivered; the older rows are the
    // already-applied prefix, not out-of-order input
    val twice = applyChanges(once, batch, "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    assert(rows(twice) == rows(once))
  }

  test("a change with NULL key or ts raises instead of silently vanishing") {
    import spark.implicits._
    val base = compress(df(Seq((1L, 1L, "a", ts("2024-01-01 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val nullTs = Seq((1L, 2L, "b", Option.empty[Timestamp]))
      .toDF("user_id", "event_id", "event_type", "ts")
    val ex = intercept[Exception] {
      applyChanges(base, nullTs, "user_id", "ts",
        Seq("event_type"), Seq("event_id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("NULL")), s"wrong failure: ${ex.getMessage}")
  }

  test("an out-of-order change fails fast with the key named") {
    val base = compress(df(Seq((1L, 5L, "a", ts("2024-01-10 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val stale = df(Seq((1L, 6L, "b", ts("2024-01-02 00:00:00"))))
    val ex = intercept[Exception] {
      applyChanges(base, stale, "user_id", "ts",
        Seq("event_type"), Seq("event_id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("out-of-order SCD2 change")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("a same-ts DIFFERENT-value change fails fast too") {
    val base = compress(df(Seq((1L, 5L, "a", ts("2024-01-10 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val clash = df(Seq((1L, 6L, "b", ts("2024-01-10 00:00:00"))))
    val ex = intercept[Exception] {
      applyChanges(base, clash, "user_id", "ts",
        Seq("event_type"), Seq("event_id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("out-of-order SCD2 change")))
  }

  test("new keys open current rows; unaffected keys pass through verbatim") {
    val base = compress(df(Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 2L, "x", ts("2024-01-02 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val got = rows(applyChanges(base,
      df(Seq((3L, 9L, "n", ts("2024-01-07 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id")))
    assert(got == Seq(
      (1L, "a", 1L, ts("2024-01-01 00:00:00"), None, true),
      (2L, "x", 2L, ts("2024-01-02 00:00:00"), None, true),
      (3L, "n", 9L, ts("2024-01-07 00:00:00"), None, true)))
  }

  test("untouched current rows ride a broadcast anti-join on the batch keys") {
    val base = compress(df(Seq((1L, 1L, "a", ts("2024-01-01 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val merged = applyChanges(base,
      df(Seq((2L, 2L, "b", ts("2024-01-02 00:00:00")))),
      "user_id", "ts", Seq("event_type"), Seq("event_id"))
    val phys = merged.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      s"untouched-key pass-through is not a broadcast anti-join:\n$phys")
  }
}
