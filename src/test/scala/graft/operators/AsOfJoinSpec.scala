package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** As-of join semantics: latest-at-or-before match, inclusive equality,
  * max-tiebreak among tied build rows, left-join nulls, per-key scoping,
  * and a brute-force cross-check on real events data. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest build row at or before each probe time, per key") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (2L, 10L, ts("2026-01-01 12:00:00")),
      (3L, 20L, ts("2026-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, 100L, ts("2026-01-01 09:00:00")),
      (10L, 101L, ts("2026-01-01 11:00:00")),
      (20L, 102L, ts("2026-01-01 11:00:00")) // after the key-20 probe
    ).toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id")
      .orderBy("event_id")
      .collect()
    assert(out.map(r => Option(r.getAs[Any]("b_event_id"))).toSeq ==
      Seq(Some(100L), Some(101L), None))
  }

  test("a build row exactly at the probe time matches (inclusive)") {
    import spark.implicits._
    val t = ts("2026-01-01 10:00:00")
    val probe = Seq((1L, 10L, t)).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 100L, t)).toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id").collect()
    assert(out.head.getAs[Long]("b_event_id") == 100L)
  }

  test("tied build rows resolve to the greatest tieBreak") {
    import spark.implicits._
    val t = ts("2026-01-01 10:00:00")
    val probe = Seq((1L, 10L, ts("2026-01-01 10:30:00"))).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 100L, t), (10L, 107L, t), (10L, 103L, t))
      .toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id").collect()
    assert(out.head.getAs[Long]("b_event_id") == 107L)
  }

  test("NULL keys and NULL times never match, on either side") {
    import spark.implicits._
    val probe = Seq(
      (1L, Some(10L), Option(ts("2026-01-01 10:00:00"))), // normal match
      (2L, None, Option(ts("2026-01-01 10:00:00"))),      // null key
      (3L, Some(10L), None),                              // null time
      (4L, None, None)                                    // null both
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (Some(10L), 100L, Option(ts("2026-01-01 09:00:00"))),
      (None, 666L, Option(ts("2026-01-01 09:00:00"))), // null-key build: invisible
      (Some(10L), 667L, Option.empty[Timestamp])       // null-time build: invisible
    ).toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id")
      .orderBy("event_id").collect()
    assert(out.length == 4)
    assert(out.map(r => Option(r.getAs[Any]("b_event_id"))).toSeq ==
      Seq(Some(100L), None, None, None))
  }

  test("matches a brute-force backward lookup on real events (sf0.001)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.events(spark, sfDir)
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts")
    val got = AsOfJoin.asOf(purchases, views, "user_id", "ts", "event_id", "view_")
      .select($"event_id", $"view_event_id", $"view_ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any](1)), Option(r.getAs[Any](2))))
      .toSet
    // brute force: per purchase, scan all views
    val vs = views.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expected = purchases.collect().map { p =>
      val (pid, uid, pts) = (p.getLong(0), p.getLong(1), p.getTimestamp(2))
      val best = vs.filter(v => v._1 == uid && !v._3.after(pts))
        .sortBy(v => (v._3.toInstant.getEpochSecond, v._3.getNanos.toLong, v._2))
        .lastOption
      (pid, best.map(_._2: Any), best.map(_._3: Any))
    }.toSet
    assert(got == expected)
  }
  test("forward mode picks the earliest build row at or after each probe time") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")), // next build at 11:00
      (2L, 10L, ts("2026-01-01 11:00:00")), // inclusive: matches 11:00
      (3L, 10L, ts("2026-01-01 12:00:00")), // nothing after -> null
      (4L, 20L, ts("2026-01-01 10:30:00"))  // other key, before-only build -> null
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, 100L, ts("2026-01-01 09:00:00")),
      (10L, 101L, ts("2026-01-01 11:00:00")),
      (20L, 102L, ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id",
        buildPrefix = "b_", forward = true)
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("b_event_id"))).toSeq ==
      Seq(Some(101L), Some(101L), None, None))
  }

  test("forward mode: ties at equal time still resolve to the greatest tieBreak") {
    import spark.implicits._
    val t = ts("2026-01-01 10:00:00")
    val probe = Seq((1L, 10L, ts("2026-01-01 09:30:00"))).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 100L, t), (10L, 107L, t), (10L, 103L, t))
      .toDF("user_id", "event_id", "ts")
    val out = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id",
      buildPrefix = "b_", forward = true).collect()
    assert(out.head.getAs[Long]("b_event_id") == 107L)
  }

  test("forward mode equals the brute-force next-at-or-after join on real events") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.where($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val v = e.where($"event_type" === "view").select($"user_id", $"event_id", $"ts")
    val got = AsOfJoin.asOf(p, v, "user_id", "ts", "event_id",
        buildPrefix = "next_", forward = true)
      .select($"event_id", $"next_event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("next_event_id")))).toMap
    val views = v.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val want = p.collect().map { r =>
      val (pid, uid, pts) = (r.getLong(0), r.getLong(1), r.getTimestamp(2))
      val cands = views.filter(x => x._1 == uid && !x._3.before(pts))
      val best = if (cands.isEmpty) None
        else Some(cands.minBy(x => (x._3.getTime, -x._2))._2)
      pid -> best.map(_.asInstanceOf[Any])
    }.toMap
    assert(got == want)
  }
}
