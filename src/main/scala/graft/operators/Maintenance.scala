package graft.operators

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, Model}

/** Spark-native maintenance procedures — the reference runs these as
  * Trino `ALTER TABLE … EXECUTE` / Spark `CALL system.*` in external
  * engines (SURVEY.md §2.9); here they are plain Spark jobs in the same
  * JVM.
  *
  *  - M1 compact: binpack-style small-file rewrite of a partition range
  *    (reference maintenance.py:153-179, defaults 512 MB target,
  *    service_tasks.go:206)
  *  - M2 expireSnapshots: drop snapshots older than a cutoff, always
  *    keeping the current snapshot's ancestor chain
  *    (service_maintenance_executor_trino.go:138-158; 7-day clamp
  *    service_tasks.go:92-95)
  *  - M3 removeOrphanFiles: distributed FS listing anti-joined against
  *    the manifest, delete files older than the cutoff
  *    (service_maintenance_executor_trino.go:160-193)
  *  - M4 rollbackToSnapshot: move the current pointer and rebuild
  *    partition stats from that snapshot's manifest
  *    (service_iceberg_mutations.go:37-48)
  */
object Maintenance {

  final case class CompactResult(
      partitionsRewritten: Long, filesBefore: Long, filesAfter: Long,
      bytesRewritten: Long)

  /** M1: compact a day-range of a date-partitioned parquet table
    * (dirs `.../date=YYYY-MM-DD/`). Rewrites only the selected
    * partitions via dynamic partition overwrite; file count per
    * partition is ceil(bytes/targetFileBytes) (binpack). The rewrite is
    * one distributed job: rows are bucketed to their target file by
    * (partition, hash % nFiles) so no executor needs a whole partition
    * in memory.
    */
  def compact(spark: SparkSession, tablePath: String, from: String, until: String,
      targetFileBytes: Long, minInputFiles: Int = 2,
      sortCols: Seq[String] = Seq.empty): CompactResult = {
    import spark.implicits._

    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Per-partition (bytes, fileCount) from a one-level listing — the
    // partition dirs of the range only.
    val parts = fs.listStatus(new Path(tablePath)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .map(_.getPath)
      .filter { p =>
        val d = p.getName.stripPrefix("date=")
        d >= from && d < until
      }
    val stats = parts.map { p =>
      val files = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      (p.getName.stripPrefix("date="), files.length.toLong, files.map(_.getLen).sum)
    }
    val toRewrite = stats.filter(_._2 >= minInputFiles)
    if (toRewrite.isEmpty) return CompactResult(0, stats.map(_._2).sum, stats.map(_._2).sum, 0)

    val targets = toRewrite.map { case (d, _, bytes) =>
      d -> math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    }.toMap
    val targetsDf = targets.toSeq.toDF("date", "n_files")

    val slice = spark.read.parquet(tablePath)
      .where($"date".isin(toRewrite.map(_._1): _*))
    val bucketed = slice
      .join(broadcast(targetsDf), "date")
      .withColumn("__bucket", pmod(xxhash64(struct(slice.columns.map(col): _*)), $"n_files"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Optional clustering: sort rows within each output file so
      // parquet column min/max stats become selective (data clustering
      // for scan pruning — the sort-order half of a rewrite_data_files
      // sort strategy). The sort must come AFTER the drop and reference
      // only output columns: otherwise the writer can't see the
      // ordering and inserts its own non-stable partition-column sort,
      // destroying the clustering.
      val arranged = bucketed
        .repartition(col("date"), col("__bucket"))
        .drop("n_files", "__bucket")
      val sorted =
        if (sortCols.isEmpty) arranged
        else arranged.sortWithinPartitions((col("date") +: sortCols.map(col)): _*)
      sorted
        .write.mode(SaveMode.Overwrite)
        .partitionBy("date")
        .parquet(tablePath)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val after = toRewrite.map { case (d, _, _) =>
      fs.listStatus(new Path(tablePath, s"date=$d"))
        .count(f => f.isFile && !f.getPath.getName.startsWith("_")).toLong
    }.sum
    CompactResult(
      partitionsRewritten = toRewrite.size.toLong,
      filesBefore = stats.map(_._2).sum,
      filesAfter = after + stats.filterNot(s => targets.contains(s._1)).map(_._2).sum,
      bytesRewritten = toRewrite.map(_._3).sum)
  }

  /** M1 variant for the reference's hidden day-transform layout: a
    * table partitioned as `year=YYYY/month=MM/day=DD` (the expanded
    * day(col) transform, iceberg_client.go:476-496). Same binpack
    * semantics as [[compact]]; partition dirs are discovered by walking
    * the three levels and filtering to the [from, until) day range —
    * the walk touches only directory metadata, never data files. */
  def compactNested(spark: SparkSession, tablePath: String, from: String,
      until: String, targetFileBytes: Long, minInputFiles: Int = 2): CompactResult = {
    import spark.implicits._

    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def subdirs(p: Path, prefix: String): Seq[Path] =
      fs.listStatus(p).toSeq.filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath)
    val dayDirs = for {
      y <- subdirs(new Path(tablePath), "year=")
      m <- subdirs(y, "month=")
      d <- subdirs(m, "day=")
      date = s"${y.getName.stripPrefix("year=")}-${m.getName.stripPrefix("month=")}-${d.getName.stripPrefix("day=")}"
      if date >= from && date < until
    } yield (date, d)

    val stats = dayDirs.map { case (date, p) =>
      val files = fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      (date, files.length.toLong, files.map(_.getLen).sum)
    }
    val toRewrite = stats.filter(_._2 >= minInputFiles)
    if (toRewrite.isEmpty)
      return CompactResult(0, stats.map(_._2).sum, stats.map(_._2).sum, 0)

    val targets = toRewrite.map { case (d, _, bytes) =>
      d -> math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    }.toMap
    val targetsDf = targets.toSeq.toDF("__date", "n_files")

    // Partition-type inference reads day=05 back as int 5; normalize to
    // zero-padded strings so the dynamic overwrite targets the SAME
    // directories it read (else day=5 dirs appear beside day=05).
    val slice0 = spark.read.parquet(tablePath)
      .withColumn("year", lpad(col("year").cast("string"), 4, "0"))
      .withColumn("month", lpad(col("month").cast("string"), 2, "0"))
      .withColumn("day", lpad(col("day").cast("string"), 2, "0"))
    val dateCol = concat(col("year"), lit("-"), col("month"), lit("-"), col("day"))
    val slice = slice0.withColumn("__date", dateCol)
      .where(col("__date").isin(toRewrite.map(_._1): _*))
    val bucketed = slice
      .join(broadcast(targetsDf), "__date")
      .withColumn("__bucket",
        pmod(xxhash64(struct(slice0.columns.map(col): _*)), col("n_files")))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      bucketed
        .repartition(col("__date"), col("__bucket"))
        .drop("__date", "n_files", "__bucket")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("year", "month", "day")
        .parquet(tablePath)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val after = dayDirs.filter { case (d, _) => targets.contains(d) }.map { case (_, p) =>
      fs.listStatus(p).count(f => f.isFile && !f.getPath.getName.startsWith("_")).toLong
    }.sum
    CompactResult(
      partitionsRewritten = toRewrite.size.toLong,
      filesBefore = stats.map(_._2).sum,
      filesAfter = after + stats.filterNot(s => targets.contains(s._1)).map(_._2).sum,
      bytesRewritten = toRewrite.map(_._3).sum)
  }

  /** M1 commit: register the post-rewrite data files of `tablePath` as a
    * new `replace` snapshot in the MetaStore — the manifest-side half of
    * Iceberg's atomic `rewrite_data_files` commit. Without this the
    * compacted files are absent from the files manifest (eligible for
    * [[removeOrphanFiles]] sweep once past the retention cutoff) and the
    * current-snapshot manifest still points at the overwritten
    * pre-compaction paths. Returns the new snapshot id.
    *
    * Prior snapshots' manifest rows are kept (expire cleans them); note
    * the physical in-place overwrite means time travel into a rewritten
    * partition's history is gone — unlike Iceberg, which retains old
    * files until expiry. The file inventory is a driver-side dir walk +
    * one distributed count per file; a production writer would take both
    * from the write job's commit statistics. */
  def commitCompaction(store: MetaStore, database: String, table: String,
      tablePath: String, cfg: graft.meta.SmallFiles.Config,
      now: java.time.Instant): Long = {
    val spark = store.spark
    import spark.implicits._
    import MetaStore._

    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val inventory = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val nm = f.getPath.getName
      if (f.isFile && !nm.startsWith("_") && !nm.startsWith("."))
        inventory += ((f.getPath.toUri.getPath, f.getLen))
    }
    // Per-file record counts in one distributed scan, keyed by URI path
    // (input_file_name returns file:///… URIs).
    val counts = spark.read.parquet(tablePath)
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("fp"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long)].collect()
      .map { case (p, n) => new Path(p).toUri.getPath -> n }.toMap

    val allSnaps = store.snapshots.collect().toSeq
    val mine = allSnaps.filter(s => s.database == database && s.table == table)
    val newId = (mine.map(_.snapshotId) :+ 0L).max + 1
    val parent = store.tables.collect()
      .find(t => t.database == database && t.name == table)
      .flatMap(_.currentSnapshotId)

    val rootPath = root.toUri.getPath
    def partitionOf(path: String): Map[String, String] =
      path.stripPrefix(rootPath).split('/').iterator
        .filter(_.contains('=')).map { seg =>
          val kv = seg.split("=", 2)
          kv(0) -> kv(1)
        }.toMap

    val newRows = inventory.toSeq.map { case (p, len) =>
      Model.FileMeta(database, table, newId, content = 0, filePath = p,
        fileFormat = "PARQUET", specId = 0, partition = partitionOf(p),
        recordCount = counts.getOrElse(p, 0L), fileSizeInBytes = len)
    }
    val newSnap = Model.SnapshotMeta(database, table,
      committedAt = Timestamp.from(now), snapshotId = newId, parentId = parent,
      operation = "replace", manifestList = tablePath,
      summary = Map("operation" -> "rewrite_data_files",
        "added-data-files" -> newRows.size.toString))

    store.write("snapshots", spark.createDataset(allSnaps :+ newSnap))
    val existingFiles = if (store.exists("files")) store.files.collect().toSeq else Seq.empty
    store.write("files", spark.createDataset(existingFiles ++ newRows))
    // Move the current pointer + rebuild partition stats from the new
    // manifest (same path as M4).
    rollbackToSnapshot(store, database, table, newId, cfg, now)
    newId
  }

  final case class ExpireResult(expiredSnapshots: Seq[Long], keptSnapshots: Seq[Long])

  /** M2: expire snapshots older than `olderThan`, preserving the whole
    * ancestor chain of `currentId` (keep-chain semantics, SURVEY.md
    * §7.4 #2). Snapshot lineage is control-plane metadata (small) — the
    * chain walk collects (id, parent) pairs only; the row deletes stay
    * in Spark. */
  def expireSnapshots(store: MetaStore, database: String, table: String,
      currentId: Long, olderThan: Timestamp): ExpireResult = {
    import store.spark.implicits._
    import MetaStore._

    val snaps = store.snapshots.filter(s => s.database == database && s.table == table)
    val lineage = snaps.map(s => (s.snapshotId, s.parentId)).collect().toMap
    val keepChain = Iterator.iterate(Option(currentId)) {
      case Some(id) => lineage.get(id).flatten
      case None => None
    }.takeWhile(_.isDefined).map(_.get).toSet

    val all = store.snapshots.collect().toSeq
    val (mine, others) = all.partition(s => s.database == database && s.table == table)
    val (kept, expired) = mine.partition(s =>
      keepChain.contains(s.snapshotId) || !s.committedAt.before(olderThan))

    store.write("snapshots", store.spark.createDataset(others ++ kept))

    // Drop manifest rows of expired snapshots (data files referenced
    // only by expired snapshots become orphans for M3).
    val expiredIds = expired.map(_.snapshotId).toSet
    if (store.exists("files")) {
      val files = store.files.collect().toSeq.filterNot(f =>
        f.database == database && f.table == table && expiredIds.contains(f.snapshotId))
      store.write("files", store.spark.createDataset(files))
    }
    ExpireResult(expired.map(_.snapshotId).sorted, kept.map(_.snapshotId).sorted)
  }

  final case class OrphanResult(orphans: Seq[String], deleted: Long)

  /** M3: remove files under `tableRoot` that no manifest row references
    * and that are older than `olderThan`. The listing is distributed:
    * first-level dirs fan out to executors, each lists its subtree —
    * the file inventory never collects to the driver before the
    * anti-join. */
  def removeOrphanFiles(spark: SparkSession, store: MetaStore, tableRoot: String,
      database: String, table: String, olderThan: Timestamp,
      dryRun: Boolean = false): OrphanResult = {
    import spark.implicits._
    import MetaStore._

    val hconf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(tableRoot)
    val fs = rootPath.getFileSystem(hconf)
    val topLevel = fs.listStatus(rootPath).toSeq.map(_.getPath.toString)

    val listed = spark.sparkContext.parallelize(topLevel, math.max(1, topLevel.size))
      .flatMap { dir =>
        val p = new Path(dir)
        val dfs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val it = dfs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        while (it.hasNext) {
          val f = it.next()
          if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
            buf += ((f.getPath.toUri.getPath, f.getModificationTime))
        }
        buf
      }.toDF("path", "mtime")

    val manifest = store.files
      .filter(f => f.database == database && f.table == table)
      .select($"filePath".as("path"))
    val orphans = listed.join(manifest, Seq("path"), "left_anti")
      .where($"mtime" < lit(olderThan.getTime))
      .select($"path")

    val paths = orphans.as[String].collect().toSeq.sorted
    var deleted = 0L
    if (!dryRun) paths.foreach { p =>
      if (fs.delete(new Path(p), false)) deleted += 1
    }
    OrphanResult(paths, deleted)
  }

  /** M4: rollback the current-snapshot pointer and rebuild partition
    * stats from that snapshot's manifest rows (one groupBy — reference
    * S6 shape). */
  def rollbackToSnapshot(store: MetaStore, database: String, table: String,
      snapshotId: Long, cfg: graft.meta.SmallFiles.Config,
      now: java.time.Instant): Unit = {
    import store.spark.implicits._
    import MetaStore._

    val snapExists = store.snapshots
      .filter(s => s.database == database && s.table == table && s.snapshotId == snapshotId)
      .take(1).nonEmpty
    require(snapExists, s"unknown snapshot $snapshotId for $database.$table")

    // Move the pointer.
    val tables = store.tables.collect().toSeq.map { t =>
      if (t.database == database && t.name == table)
        t.copy(currentSnapshotId = Some(snapshotId),
          updatedAt = Timestamp.from(now))
      else t
    }
    store.write("tables", store.spark.createDataset(tables))

    // Rebuild partition stats from the snapshot's file manifest.
    val manifest = store.files.filter(f =>
      f.database == database && f.table == table && f.snapshotId == snapshotId)
    val stats = manifest.toDF()
      .where($"content" === 0)
      .groupBy($"partition")
      .agg(
        sum($"recordCount").as("recordCount"),
        count(lit(1)).as("fileCount"),
        sum($"fileSizeInBytes").as("totalDataFileSizeInBytes"),
        graft.meta.SmallFiles.smallCountAgg($"fileSizeInBytes", cfg).as("small_count"),
        max($"specId").as("specId"))
    val cutoff = java.sql.Date.valueOf(graft.meta.SmallFiles.cutoffDay(now, cfg.delayHours))
    val scored = stats
      .withColumn("part_date", when($"partition".getItem("year").isNotNull,
        try_to_date(concat_ws("-",
          $"partition".getItem("year"),
          lpad(coalesce($"partition".getItem("month"), lit("01")), 2, "0"),
          lpad(coalesce($"partition".getItem("day"), lit("01")), 2, "0")))))
      .withColumn("needsOptimize",
        $"small_count" >= cfg.minCount &&
          $"small_count" * 100 >= $"fileCount" * cfg.minSharePercent &&
          !($"part_date".isNotNull && $"part_date" > lit(cutoff)))
      .withColumn("database", lit(database))
      .withColumn("table", lit(table))
      .withColumn("lastUpdatedAt", lit(Timestamp.from(now)))
      .withColumn("lastUpdatedSnapshotId", lit(snapshotId))
      .select($"database", $"table", $"partition", $"specId".cast("int").as("specId"),
        $"recordCount", $"fileCount", $"totalDataFileSizeInBytes",
        $"lastUpdatedAt", $"lastUpdatedSnapshotId", $"needsOptimize")
      .as[Model.PartitionStat]

    val others = store.partitions.filter(p =>
      !(p.database == database && p.table == table)).collect().toSeq
    val rebuilt = scored.collect().toSeq
    store.write("partitions", store.spark.createDataset(others ++ rebuilt))
  }
}
