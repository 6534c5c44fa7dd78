package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MODEL-BASED slicing invariance for the standing interval index: for
  * ANY random partition of the interval set into ingest batches, with
  * replays, compaction, vacuum, and a logical expiry cutoff thrown in
  * at random, `lookup` must equal the in-flight banded join
  * ([[IntervalJoin.pointInInterval]]) over the SAME intervals with the
  * same cutoff applied — the store is an index, never a semantic
  * actor. Fixed seeds; failures replay exactly. */
class IntervalIndexStoreModelSpec extends SparkSpec {

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

  private val Band = 86400L // one day, micros applied in-store

  private def runSeed(seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"ivl-model-$seed-").toString
    // random slicing by view_id residue classes (k slices, any order)
    val k = rnd.nextInt(3) + 2 // 2..4 batches
    val order = rnd.shuffle((0 until k).toList)
    IntervalIndexStore.build(views.where($"view_id" % k === order.head),
      dir, "user_id", "w_start", "w_end", bandSeconds = Band)
    var nFold = 0
    order.tail.zipWithIndex.foreach { case (residue, i) =>
      IntervalIndexStore.append(views.where($"view_id" % k === residue),
        dir, s"b$i")
      if (rnd.nextInt(3) == 0) // replay no-op
        IntervalIndexStore.append(views.where($"view_id" % k === residue),
          dir, s"b$i")
      rnd.nextInt(4) match {
        case 0 =>
          nFold += 1
          IntervalIndexStore.compact(spark, dir, s"fold$nFold")
        case 1 => IntervalIndexStore.vacuum(spark, dir); ()
        case _ =>
      }
    }
    // the model: the in-flight banded join over ALL the intervals
    val full = pairs(IntervalJoin.pointInInterval(purchases, views,
      "user_id", "ts", "w_start", "w_end", bandSeconds = Band))
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
      == full, s"seed=$seed (k=$k, order=$order): sliced store " +
        "diverged from the in-flight join")
    // logical expiry: slices strictly older than a cutoff drawn from
    // the point set stop matching; the model applies the same band
    // floor (div-truncated, matching the store's arithmetic)
    val cutoff = purchases.select($"ts").orderBy($"ts")
      .collect()(rnd.nextInt(10)).getTimestamp(0)
    IntervalIndexStore.expire(spark, dir, cutoff)
    if (rnd.nextBoolean()) { IntervalIndexStore.vacuum(spark, dir); () }
    val floor = (cutoff.getTime * 1000L) / (Band * 1000000L)
    val modelAfter = pairs(IntervalJoin.pointInInterval(
      purchases.where(expr(s"unix_micros(ts) div ${Band * 1000000L}") >= floor),
      views, "user_id", "ts", "w_start", "w_end", bandSeconds = Band))
    assert(pairs(IntervalIndexStore.lookup(spark, dir, purchases, "ts"))
      == modelAfter,
      s"seed=$seed: expiry floor diverged from the model's cutoff")
  }

  Seq(11L, 271828L, 20260816L).foreach { seed =>
    test(s"any slicing + maintenance equals the in-flight join (seed $seed)") {
      runSeed(seed)
    }
  }
}
