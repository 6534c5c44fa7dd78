package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The standing interval index must be semantically invisible (lookup ==
  * the in-flight banded join on the same data), replay-idempotent under
  * at-least-once appends, and actually PRUNE: the band partition column
  * must carry a dynamic-pruning filter into the store scan, because
  * reading the whole store for a narrow point batch is the difference
  * between an index and a copy. */
class IntervalIndexStoreSpec extends SparkSpec {

  private def views: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir).where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
  }
  private def purchases: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir).where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
  }

  private def pairs(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.select($"i_view_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  test("lookup equals the in-flight banded join exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivx-eq").toString
    IntervalIndexStore.build(views, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    val got = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    val expect = pairs(IntervalJoin.pointInInterval(purchases, views,
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      bandSeconds = 3L * 86400L))
    assert(got.nonEmpty && got == expect)
  }

  test("band partition column carries a dynamic pruning filter into the store scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivx-dpp").toString
    IntervalIndexStore.build(views, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    // a narrow point batch: one day of purchases → ≤2 bands
    import spark.implicits._
    val day = purchases.where(to_date($"ts") === lit("2025-02-01"))
    val q = IntervalIndexStore.lookup(spark, dir, broadcast(day), "ts")
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("dynamicpruning"),
      s"no dynamic partition pruning on the band column:\n$phys")
  }

  test("appends land; replaying the same label is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-app").toString
    val (oldV, newV) = (views.where($"view_id" % 2 === 0),
      views.where($"view_id" % 2 =!= 0))
    IntervalIndexStore.build(oldV, dir, "user_id", "w_start", "w_end",
      bandSeconds = 3L * 86400L)
    val partial = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    IntervalIndexStore.append(newV, dir, "delta1")
    IntervalIndexStore.append(newV, dir, "delta1") // at-least-once replay
    val full = pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
    val expect = pairs(IntervalJoin.pointInInterval(purchases, views,
      key = "user_id", ts = "ts", start = "w_start", end = "w_end",
      bandSeconds = 3L * 86400L))
    assert(full == expect, "replayed append duplicated or lost pairs")
    assert(partial.size < full.size, "append test vacuous: delta added nothing")
    // audit sees both batches and a sane banded-row count
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(1) == 2, s"expected 2 ingest batches, got ${a.getLong(1)}")
    assert(a.getLong(0) >= views.count(), "banded rows below interval count")
  }

  test("reserved label and degenerate intervals are rejected/dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivx-guard").toString
    // degenerate + NULL-bound rows vanish at build (they can never match)
    val bad = Seq(
      (1L, 10L, "2024-01-05 00:00:00", "2024-01-01 00:00:00"), // reversed
      (1L, 11L, null, "2024-01-02 00:00:00"),                  // NULL start
      (1L, 12L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")) // good
      .toDF("user_id", "view_id", "s", "e")
      .select($"user_id", $"view_id", $"s".cast("timestamp").as("w_start"),
        $"e".cast("timestamp").as("w_end"))
    IntervalIndexStore.build(bad, dir, "user_id", "w_start", "w_end",
      bandSeconds = 86400L)
    val a = IntervalIndexStore.audit(spark, dir).collect().head
    assert(a.getLong(0) == 2, s"1-day interval on 1-day bands → 2 banded rows, got ${a.getLong(0)}")
    intercept[IllegalArgumentException](
      IntervalIndexStore.append(bad, dir, "base"))
  }
}
