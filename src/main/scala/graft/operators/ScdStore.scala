package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STANDING SCD2 dimension: [[ScdMerge]] made operational, with the
  * write layout its `mergeParts` split exists for.
  *
  *  - `history/batch=<label>/` — APPEND-ONLY: each committed batch adds
  *    the rows it closed and never touches earlier directories. At
  *    100 TB the history partition is the ~whole dimension and this is
  *    the property that makes nightly merges affordable: the write is
  *    batch-sized, never history-sized.
  *  - `current/v<N>/` — the only REWRITE, and it is current-partition-
  *    sized (≈ one row per key). Version directories are immutable;
  *    the live one is named by the manifest.
  *  - `_live.json` — the commit pointer: `{version, applied:[labels]}`.
  *    A batch label becomes visible only when it lands in `applied`,
  *    and readers resolve BOTH the history label set and the current
  *    version through the manifest — a crash between data writes and
  *    the manifest swap leaves orphan directories no reader sees, and
  *    the replayed batch overwrites them and commits (the
  *    [[IntervalIndexStore]] manifest discipline; Iceberg's
  *    metadata-pointer-is-the-commit, reference maintenance.py drives
  *    the same machinery).
  *
  * Exactly-once ingest falls out: a replayed label is already in
  * `applied` → no-op. [[ingestStream]] labels each epoch
  * `<prefix>-<batchId>`, so at-least-once micro-batch delivery
  * converges without read-side dedup (spec-pinned, crash injection
  * included).
  */
object ScdStore {

  private def historyPath(dir: String) = s"$dir/history"
  private def currentPath(dir: String, v: Long) = s"$dir/current/v$v"
  private def metaPath(dir: String) = s"$dir/_meta.json"
  private def manifestPath(dir: String) = s"$dir/_live.json"

  // Shared store plumbing: Hadoop-FS metadata I/O, atomic pointer
  // swap, and the F8 label/column allowlists.
  import StoreIO.{readString, requireColName, requireLabel, writeString}

  /** Initialize the store from a raw change log: compress → history
    * rows under `batch=base`, current rows as `current/v1`. */
  def init(log: DataFrame, dir: String, key: String, ts: String,
      values: Seq[String], carry: Seq[String] = Nil): Unit = {
    (key +: ts +: values ++: carry).foreach(requireColName)
    val spark = log.sparkSession
    val scd = ScdMerge.compress(log, key, ts, values, carry)
    scd.where(col("valid_to").isNotNull)
      .write.mode(SaveMode.Overwrite).parquet(s"${historyPath(dir)}/batch=base")
    scd.where(col("valid_to").isNull)
      .write.mode(SaveMode.Overwrite).parquet(currentPath(dir, 1L))
    val meta = s"""{"key":"$key","ts":"$ts",""" +
      s""""values":[${values.map(v => s""""$v"""").mkString(",")}],""" +
      s""""carry":[${carry.map(c => s""""$c"""").mkString(",")}]}"""
    writeString(spark, metaPath(dir), meta, atomic = false)
    writeManifest(spark, dir, Manifest(1L, Seq("base"), Seq("base")))
  }

  /** Apply one change batch under `label`. Committed labels are
    * immutable — a replay is a no-op, so at-least-once delivery
    * converges. `beforeCommit` is the crash-injection seam for the
    * spec (runs after both data writes, before the manifest swap). */
  def applyBatch(changes: DataFrame, dir: String, label: String,
      beforeCommit: () => Unit = () => ()): Unit = {
    val spark = changes.sparkSession
    requireLabel(label)
    require(label != "base", "label 'base' is reserved")
    val man = manifest(spark, dir)
    if (man.applied.contains(label)) return // committed = immutable
    val m = meta(spark, dir)
    // `materialize = localCheckpoint` pins the windowed merge to ONE
    // execution shared by both writes (and detaches them from a
    // current version the commit below is about to supersede)
    val (closedDelta, newCurrent) = ScdMerge.mergeParts(
      current(spark, dir), changes, m.key, m.ts, m.values, m.carry,
      materialize = _.localCheckpoint())
    closedDelta.write.mode(SaveMode.Overwrite)
      .parquet(s"${historyPath(dir)}/batch=$label")
    newCurrent.write.mode(SaveMode.Overwrite)
      .parquet(currentPath(dir, man.version + 1))
    beforeCommit()
    // fresh pointer read before the swap, but the committed version
    // must name the directory THIS batch wrote (man.version + 1) — a
    // drifted counter means the single-writer contract was violated,
    // and committing fresh.version + 1 would point every later read at
    // a directory nobody wrote. Fail loudly instead.
    val fresh = manifest(spark, dir)
    if (!fresh.applied.contains(label)) {
      require(fresh.version == man.version,
        s"concurrent ScdStore commit detected (version ${man.version} -> " +
          s"${fresh.version} during applyBatch '$label'); single writer is " +
          "the contract — replay the batch")
      writeManifest(spark, dir,
        Manifest(man.version + 1, fresh.applied :+ label,
          fresh.histLive :+ label))
    }
  }

  /** The live current partition (≈ one row per key, `valid_to` NULL). */
  def current(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(currentPath(dir, manifest(spark, dir).version))

  /** The full SCD2 table: live history label dirs ∪ live current.
    * (`histLive` names the DATA directories; `applied` is the replay
    * ledger and keeps labels compaction has folded away.) */
  def table(spark: SparkSession, dir: String): DataFrame = {
    val man = manifest(spark, dir)
    val hist = spark.read
      .option("basePath", historyPath(dir))
      .parquet(man.histLive.map(l => s"${historyPath(dir)}/batch=$l"): _*)
      .drop("batch")
    hist.unionByName(spark.read.parquet(currentPath(dir, man.version)))
  }

  /** State-at-time read: the ≤1 row per key valid at `ts` (half-open
    * `[valid_from, valid_to)` — a change instant belongs to the NEW
    * row, so keys are never double-counted at boundaries). */
  def asOf(spark: SparkSession, dir: String,
      at: java.sql.Timestamp): DataFrame =
    table(spark, dir).where(col("valid_from") <= lit(at) &&
      (col("valid_to").isNull || col("valid_to") > lit(at)))

  /** Continuous maintenance: each micro-batch of change events is one
    * [[applyBatch]] under the deterministic label `<prefix>-<batchId>`;
    * replays no-op (exactly-once, crash specs). */
  def ingestStream(changes: DataFrame, dir: String,
      checkpointLocation: String,
      trigger: Trigger = Trigger.AvailableNow(),
      labelPrefix: String = "epoch",
      afterApply: Long => Unit = _ => ()): StreamingQuery = {
    requireLabel(labelPrefix)
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (delta: DataFrame, batchId: Long) =>
        if (!delta.isEmpty) applyBatch(delta, dir, s"$labelPrefix-$batchId")
        afterApply(batchId)
      }
      .trigger(trigger)
      .start()
  }

  /** M1 for the history side: merge every live history label into one.
    * Continuous ingest otherwise accretes a directory per epoch and
    * every table() read lists them all. The swap is one manifest
    * write; old label dirs become orphans for [[vacuum]]. The APPLIED
    * ledger is preserved (plus `intoLabel`): folding a batch's data
    * into the merged dir must not un-commit its label, or a streaming
    * replay after compaction would re-merge an already-applied epoch
    * (and trip the out-of-order guard). */
  def compactHistory(spark: SparkSession, dir: String,
      intoLabel: String): Unit = {
    val man = manifest(spark, dir)
    requireLabel(intoLabel)
    require(!man.applied.contains(intoLabel),
      s"compact label '$intoLabel' must be new (applied: ${man.applied.mkString(",")})")
    spark.read
      .option("basePath", historyPath(dir))
      .parquet(man.histLive.map(l => s"${historyPath(dir)}/batch=$l"): _*)
      .drop("batch")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${historyPath(dir)}/batch=$intoLabel")
    // `version` NAMES the live current directory — compaction touches
    // only the history label set, so it must not advance it
    writeManifest(spark, dir,
      Manifest(man.version, man.applied :+ intoLabel, Seq(intoLabel)))
  }

  /** M3: delete history labels and current versions the manifest does
    * not name — crashed batches, compacted-away labels, superseded
    * current versions. Returns (history dirs, current dirs) deleted. */
  def vacuum(spark: SparkSession, dir: String): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val man = manifest(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    def sweep(root: String, keep: String => Boolean): Int = {
      val p = new Path(root)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) 0
      else {
        val victims = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
          .filterNot(d => keep(d.getName))
        victims.foreach(fs.delete(_, true))
        victims.length
      }
    }
    val h = sweep(historyPath(dir),
      n => man.histLive.contains(n.stripPrefix("batch=")))
    val c = sweep(s"$dir/current", _ == s"v${man.version}")
    (h, c)
  }

  /** Store health: key count, open rows, history rows/batches, version. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val man = manifest(spark, dir)
    val cur = current(spark, dir)
    val m = meta(spark, dir)
    val hist = spark.read
      .option("basePath", historyPath(dir))
      .parquet(man.histLive.map(l => s"${historyPath(dir)}/batch=$l"): _*)
    cur.agg(count(lit(1)).as("current_rows"),
        countDistinct(col(m.key)).as("current_keys"))
      .crossJoin(hist.agg(count(lit(1)).as("history_rows"),
        countDistinct(col("batch")).as("history_batches")))
      .withColumn("version", lit(man.version))
  }

  private[operators] case class Meta(key: String, ts: String,
      values: Seq[String], carry: Seq[String])

  private[operators] def meta(spark: SparkSession, dir: String): Meta = {
    val raw = readString(spark, metaPath(dir))
    def s(field: String) =
      s""""$field":"([^"]+)"""".r.findFirstMatchIn(raw).get.group(1)
    def arr(field: String) =
      s""""$field":\\[([^\\]]*)\\]""".r.findFirstMatchIn(raw).get.group(1)
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    Meta(s("key"), s("ts"), arr("values"), arr("carry"))
  }

  /** `applied` is the REPLAY LEDGER (every label ever committed —
    * compaction never removes one); `histLive` names the history
    * directories reads list (compaction collapses them). */
  private[operators] case class Manifest(version: Long,
      applied: Seq[String], histLive: Seq[String])

  private[operators] def manifest(spark: SparkSession, dir: String): Manifest = {
    val raw = readString(spark, manifestPath(dir))
    val v = """"version":(\d+)""".r.findFirstMatchIn(raw).get.group(1).toLong
    def arr(field: String): Option[Seq[String]] =
      (""""""" + field + """":\[([^\]]*)\]""").r.findFirstMatchIn(raw).map(
        _.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq)
    val applied = arr("applied").get
    Manifest(v, applied, arr("histLive").getOrElse(applied))
  }

  private[operators] def writeManifest(spark: SparkSession, dir: String,
      m: Manifest): Unit = {
    val body = s"""{"version":${m.version},""" +
      s""""applied":[${m.applied.map(l => s""""$l"""").mkString(",")}],""" +
      s""""histLive":[${m.histLive.map(l => s""""$l"""").mkString(",")}]}"""
    writeString(spark, manifestPath(dir), body, atomic = true)
  }

  // ---- q160: the standing store, hash-checked against one-pass SQL --

  private val builtFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q160: the full SCD2 table SERVED FROM THE STORE after an init plus
    * two committed change batches — hash-checked against the same
    * one-pass full-compress oracle as q159, so init → apply → apply →
    * read is semantically invisible end-to-end (the q156/q157 bar). */
  def q160Scd2Store(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = builtFor.computeIfAbsent(d, { _ =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-scd-").toString
      val f = graft.sources.Tables.events(spark, d)
        .where($"event_type" === "signup" || $"event_type" === "purchase")
        .select($"user_id", $"event_id", $"event_type", $"ts")
      val (c1, c2) = (lit("2024-01-11").cast("timestamp"),
        lit("2024-01-21").cast("timestamp"))
      init(f.where($"ts" < c1), dir, key = "user_id", ts = "ts",
        values = Seq("event_type"), carry = Seq("event_id"))
      applyBatch(f.where($"ts" >= c1 && $"ts" < c2), dir, "b1")
      applyBatch(f.where($"ts" >= c2), dir, "b2")
      dir
    })
    table(spark, dir).orderBy($"user_id", $"valid_from", $"event_id")
  }

  /** Same shape as q159's oracle: the store must reproduce the one-pass
    * compression of the whole log. */
  val q160Sql: String = ScdMerge.q159Sql

  /** Same teardown contract as [[IntervalIndexStore.clearSessionState]]. */
  def clearSessionState(): Unit = {
    StoreIO.deleteLocalDirs(builtFor.values)
    builtFor.clear()
  }
}
