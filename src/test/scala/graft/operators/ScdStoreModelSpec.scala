package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MODEL-BASED batching invariance for the SCD2 store: for ANY
  * time-ordered partition of the change log into batches — random cut
  * points, random batch counts, maintenance (compactHistory / vacuum /
  * expireCommits) interleaved at random, random replays — the standing
  * store must serve exactly `ScdMerge.compress(full log)`. The one-pass
  * compression is the model; the incremental path must be semantically
  * invisible no matter how ingestion was sliced. Fixed seeds, so
  * failures replay exactly. */
class ScdStoreModelSpec extends SparkSpec {

  import ScdStore._

  private def log: DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .where($"event_type" === "signup" || $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"event_type", $"ts")
  }

  private def rows(d: DataFrame): Seq[String] = {
    import spark.implicits._
    d.select($"user_id", $"event_type", $"event_id", $"valid_from",
        $"valid_to", $"is_current")
      .collect().map(_.toString).sorted.toSeq
  }

  private def runSeed(seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"scd-model-$seed-").toString
    // random time-ordered slicing: k-1 distinct cut timestamps drawn
    // from the log itself, so batch boundaries land ON change instants
    // (the adversarial case for the half-open validity windows)
    val k = rnd.nextInt(4) + 2 // 2..5 batches
    val ts = log.select($"ts").distinct().orderBy($"ts")
      .collect().map(_.getTimestamp(0))
    val cuts = (1 until k)
      .map(_ => ts(rnd.nextInt(ts.length))).distinct.sorted
    val bounds = (None +: cuts.map(Some(_))) :+ None
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      log.where(lo.fold(lit(true))($"ts" >= lit(_)) &&
        hi.fold(lit(true))($"ts" < lit(_)))
    }.filter(!_.isEmpty).toSeq
    init(batches.head, dir, "user_id", "ts", Seq("event_type"),
      Seq("event_id"))
    var nFold = 0
    batches.tail.zipWithIndex.foreach { case (b, i) =>
      applyBatch(b, dir, s"b$i")
      if (rnd.nextInt(3) == 0) applyBatch(b, dir, s"b$i") // replay no-op
      rnd.nextInt(4) match {
        case 0 =>
          nFold += 1
          compactHistory(spark, dir, s"fold$nFold")
        case 1 => vacuum(spark, dir); ()
        case 2 => expireCommits(spark, dir, keepLast = rnd.nextInt(3) + 1); ()
        case _ =>
      }
    }
    val model = ScdMerge.compress(log, "user_id", "ts",
      Seq("event_type"), Seq("event_id"))
    assert(rows(table(spark, dir)) == rows(model),
      s"seed=$seed (k=$k, cuts=${cuts.mkString(",")}): the sliced " +
        "ingest diverged from the one-pass compression")
    // the current partition is exactly the model's open rows
    assert(rows(current(spark, dir)) ==
      rows(model.where($"valid_to".isNull)),
      s"seed=$seed: current() diverged from the model's open rows")
  }

  Seq(7L, 404L, 99991L, 20260816L).foreach { seed =>
    test(s"any time-ordered batching equals the one-pass compression (seed $seed)") {
      runSeed(seed)
    }
  }
}
