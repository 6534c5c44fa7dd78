package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MODEL-BASED testing for the composed table format: a seeded random
  * sequence of append / delete / replay / optimize / vacuum /
  * expireCommits / syncMirror ops runs against both the real
  * [[GraftTable]] and a ~30-line in-memory model, and after every op
  * the real `read()` must equal the model exactly. Retained commit
  * snapshots are checked against the model's state-at-commit at the
  * end, and the CDC consumer (`syncMirror` → `mirrorRead`) must always
  * converge to `read()` — exercising `changesBetween` end to end
  * without re-stating its algebra in the model.
  *
  * The model is deliberately trivial — `appended` rows minus a live
  * `deleted` key set, folded at optimize — so any divergence is the
  * ENGINE's bug, not a second implementation agreeing with the first.
  * Seeds are fixed: failures replay exactly. */
class GraftTableModelSpec extends SparkSpec {

  import GraftTable._

  private case class ModelRow(id: Long, part: Long, qty: Long)

  /** The in-memory twin: live rows = appended minus live delete keys;
    * optimize folds the deletes in and clears them. */
  private class Model {
    var appended: Vector[ModelRow] = Vector.empty
    var deleted: Set[Long] = Set.empty
    // state-at-commit for travel checks (commit -> folded live rows)
    var atCommit: Map[Long, Vector[ModelRow]] = Map.empty
    def live: Vector[ModelRow] =
      appended.filterNot(r => deleted.contains(r.id))
    def snapshot(c: Long): Unit = atCommit += (c -> live)
  }

  private def toDf(rows: Seq[ModelRow]): DataFrame = {
    import spark.implicits._
    // tuples, not the inner case class: Spark cannot build an encoder
    // for a class nested in a test suite instance
    rows.map(r => (r.id, r.part, r.qty)).toDF("id", "part", "qty")
  }

  private def readRows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("id"), col("part"), col("qty")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  private def modelRows(rows: Seq[ModelRow]): Seq[(Long, Long, Long)] =
    rows.map(r => (r.id, r.part, r.qty)).sorted

  private def runSeed(seed: Long, nOps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"gt-model-$seed-").toString
    val mirror = java.nio.file.Files
      .createTempDirectory(s"gt-mirror-$seed-").toString
    create(spark, dir, zoneCols = Seq("part"), bloomCols = Seq("id"),
      deleteKeys = Seq("id"))
    val m = new Model
    m.snapshot(manifest(spark, dir).commit) // the create commit
    var nextBatch = 0
    var nextErase = 0
    var nextOpt = 0
    var appliedOps = Vector.empty[() => Unit] // for replay idempotence

    def freshBatch(): Seq[ModelRow] = {
      val b = nextBatch; nextBatch += 1
      // ~20% key overlap with earlier batches: re-inserts after deletes
      // and double-inserts are the interesting paths
      (0 until 40).map { i =>
        val id =
          if (b > 0 && rnd.nextInt(5) == 0) rnd.nextInt(b * 40).toLong
          else b * 40L + i
        ModelRow(id, part = rnd.nextInt(100).toLong,
          qty = rnd.nextInt(50).toLong + 1)
      }
    }

    def doAppend(): Unit = {
      val rows = freshBatch()
      val label = s"b$nextBatch"
      val op = () => append(toDf(rows), dir, label)
      op()
      m.appended ++= rows
      m.snapshot(manifest(spark, dir).commit)
      appliedOps :+= op
    }

    def doDelete(): Unit = {
      // mix of present, already-deleted, and never-present keys
      val pool = m.appended.map(_.id)
      val keys = (0 until 6).map(_ => rnd.nextInt(3) match {
        case 0 if pool.nonEmpty => pool(rnd.nextInt(pool.size))
        case 1 => rnd.nextLong(10000)
        case _ if m.deleted.nonEmpty =>
          m.deleted.toSeq(rnd.nextInt(m.deleted.size))
        case _ => rnd.nextLong(10000)
      }).distinct
      val label = s"e$nextErase"; nextErase += 1
      import spark.implicits._
      val op = () => delete(keys.toDF("id"), dir, label)
      op()
      m.deleted ++= keys
      m.snapshot(manifest(spark, dir).commit)
      appliedOps :+= op
    }

    def doOptimize(): Unit = {
      val label = s"opt$nextOpt"; nextOpt += 1
      optimize(spark, dir, label, nFiles = 2)
      m.appended = m.live
      m.deleted = Set.empty
      m.snapshot(manifest(spark, dir).commit)
    }

    def doReplay(): Unit =
      if (appliedOps.nonEmpty)
        appliedOps(rnd.nextInt(appliedOps.size))() // must be a no-op

    // the WHOLE consumer family syncs on every doSync, each with its
    // own bucket count (1 exercises the degenerate single-bucket
    // layout), and each is compared against a from-scratch restatement
    // of the live table — baseline, delta, optimize-window re-baseline,
    // and expired-log re-baseline paths all land here at random
    val aggM = java.nio.file.Files
      .createTempDirectory(s"gt-aggm-$seed-").toString
    val whereM = java.nio.file.Files
      .createTempDirectory(s"gt-wherem-$seed-").toString
    val bucketChoices = Seq(1, 2, 4, 16)
    def doSync(): Unit = {
      syncMirror(spark, dir, mirror,
        buckets = bucketChoices(rnd.nextInt(bucketChoices.size)))
      assert(readRows(mirrorRead(spark, mirror)) == readRows(read(spark, dir)),
        s"seed=$seed: mirror diverged from read()")
      syncAggMirror(spark, dir, aggM, Seq("part"), Seq("qty"),
        Seq("qty"), Seq("qty"),
        buckets = bucketChoices(rnd.nextInt(bucketChoices.size)))
      val scratch = read(spark, dir).groupBy(col("part"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty").cast("decimal(28,2)")).cast("decimal(28,2)")
            .as("sum_qty"),
          min(col("qty")).as("min_qty"), max(col("qty")).as("max_qty"))
      assert(aggMirrorRead(spark, aggM).collect().map(_.toString).sorted.toSeq
        == scratch.collect().map(_.toString).sorted.toSeq,
        s"seed=$seed: agg mirror diverged from the from-scratch aggregate")
      syncMirrorWhere(spark, dir, whereM, "part < 50",
        Seq("id", "part", "qty"),
        buckets = bucketChoices(rnd.nextInt(bucketChoices.size)))
      assert(readRows(mirrorRead(spark, whereM)) ==
        readRows(read(spark, dir).where(col("part") < 50)),
        s"seed=$seed: filtered mirror diverged from the filtered read")
    }

    doAppend() // the table needs data before most ops are legal
    (1 until nOps).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => doAppend()
        case 3 | 4 => doDelete()
        case 5 => doOptimize()
        case 6 => vacuum(spark, dir)
        case 7 => expireCommits(spark, dir,
          keepLast = rnd.nextInt(4) + 2); ()
        case 8 => doReplay()
        case 9 => doSync()
      }
      assert(readRows(read(spark, dir)) == modelRows(m.live),
        s"seed=$seed: read() diverged from the model after op $i")
    }
    // travel: every still-retained commit must equal the model's
    // state at that commit (create has no data and refuses — skip it)
    val retainedWithData = m.atCommit.keys.toSeq.sorted.filter { c =>
      new java.io.File(s"$dir/_commits/c$c.json").exists() &&
        m.atCommit(c).nonEmpty
    }
    retainedWithData.foreach { c =>
      assert(readRows(tableAt(spark, dir, c)) == modelRows(m.atCommit(c)),
        s"seed=$seed: tableAt($c) diverged from the model's snapshot")
    }
    // and the consumer converges at the end regardless of what expiry
    // did to its last-synced window (re-baseline path)
    doSync()
  }

  Seq(41L, 1337L, 20260816L).foreach { seed =>
    test(s"random op sequence agrees with the in-memory model (seed $seed)") {
      runSeed(seed, nOps = 24)
    }
  }
}
