package graft.operators

import graft.SparkSpec
import graft.queries.Relational4

/** Edge-case coverage for q91 rolling 7-day distinct actives. */
class RollingDauSpec extends SparkSpec {

  test("empty events table yields an empty frame, not an NPE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dau-empty").toString
    // empty events parquet with the production schema (ts is epoch-ns
    // long, as the driver's generator writes it)
    spark.range(0)
      .select($"id".as("event_id"), $"id".as("ts"), $"id".as("user_id"),
        $"id".cast("string").as("event_type"), $"id".cast("double").as("value"),
        $"id".cast("string").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Relational4.q91RollingDau(spark, dir)
    assert(out.columns.toSeq == Seq("report_day", "wau", "active_user_days"))
    assert(out.count() == 0L)
  }

  test("single-day events: one report day, wau = distinct users") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dau-one").toString
    val dayNs = 1700000000L * 1000000000L
    spark.createDataFrame(Seq(
      (1L, dayNs, 10L, "view", 1.0, "{}"),
      (2L, dayNs + 3600L * 1000000000L, 11L, "view", 1.0, "{}"),
      (3L, dayNs, 10L, "click", 1.0, "{}")
    )).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Relational4.q91RollingDau(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 2L) // wau: users 10, 11
    assert(rows(0).getLong(2) == 2L) // user-days, not events
  }
}
