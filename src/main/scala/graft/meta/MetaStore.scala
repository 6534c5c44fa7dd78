package graft.meta

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SaveMode, SparkSession}

/** Parquet-backed metadata store — the Spark-native replacement for the
  * reference's MySQL cache (SURVEY.md §7.1 MetaStore; DDL under
  * backend/build/migrations/). One directory per metadata table
  * (`tables`, `partitions`, `snapshots`, `files`, `tasks`, `settings`).
  *
  * Scale posture: the metadata tables would be partitioned by
  * (database, table) on a real deployment so per-table refresh/queries
  * prune; at test scale they are small single-directory tables. All
  * mutations are whole-slice overwrites (the reference's
  * DELETE+INSERT refresh pattern, service_refresh.go:111-199) —
  * format-level atomic per table, single-writer by design (the
  * reference is also a single process).
  */
final class MetaStore(val spark: SparkSession, val root: String) {

  def path(name: String): String = s"$root/$name"

  def write[T](name: String, ds: Dataset[T], mode: SaveMode = SaveMode.Overwrite): Unit =
    ds.write.mode(mode).parquet(path(name))

  /** Read-modify-write overwrite for a slice that is *derived from the
    * slice being replaced* (anti-join/union mutations): parquet overwrite
    * of a path that feeds the plan would truncate its own input, and
    * collecting to the driver doesn't scale past control-plane tables —
    * so write the new content to a temp dir fully distributed, then swap
    * directories. Single-writer by design (like the reference's single
    * process), so the non-transactional swap window is fine. */
  def rewrite[T](name: String, ds: Dataset[T]): Unit = {
    val target = new org.apache.hadoop.fs.Path(path(name))
    val tmp = new org.apache.hadoop.fs.Path(path(name) + "__tmp")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    ds.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Crash-durable promotion: move the old slice ASIDE (rename, not
    // delete) before promoting tmp — a kill between the two renames
    // leaves both the old and new content on disk for manual recovery,
    // where delete-then-rename would lose the slice entirely.
    val old = new org.apache.hadoop.fs.Path(path(name) + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"could not move $target aside to $old")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"could not swap $tmp into $target " +
        s"(previous content preserved at $old)")
    fs.delete(old, true)
  }

  def exists(name: String): Boolean = {
    // Hadoop FS, not java.io.File: a non-local root (s3a://, hdfs://)
    // would otherwise read every slice as silently empty.
    val p = new org.apache.hadoop.fs.Path(path(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read a metadata table; empty typed Dataset when absent. */
  def read[T: Encoder](name: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    if (exists(name))
      spark.read.schema(enc.schema).parquet(path(name)).as[T]
    else
      spark.emptyDataset[T]
  }

  def readDf(name: String): DataFrame =
    spark.read.parquet(path(name))

  def tables: Dataset[Model.TableMeta] = read[Model.TableMeta]("tables")(MetaStore.tableMetaEnc)
  def partitions: Dataset[Model.PartitionStat] = read[Model.PartitionStat]("partitions")(MetaStore.partitionStatEnc)
  def snapshots: Dataset[Model.SnapshotMeta] = read[Model.SnapshotMeta]("snapshots")(MetaStore.snapshotMetaEnc)
  def files: Dataset[Model.FileMeta] = read[Model.FileMeta]("files")(MetaStore.fileMetaEnc)
  def tasks: Dataset[Model.TaskRow] = read[Model.TaskRow]("tasks")(MetaStore.taskRowEnc)
  def settings: Dataset[Model.Setting] = read[Model.Setting]("settings")(MetaStore.settingEnc)
  def columnStats: Dataset[Model.ColumnStat] = read[Model.ColumnStat]("column_stats")(MetaStore.columnStatEnc)

  /** Setting lookup with reference defaults (service_settings.go:15-23,
    * GetSetting go:50-61). Settings are read *at use time*, not cached —
    * the reference re-queries the settings table on every claim/scoring
    * call so operators pick up changes without a restart. */
  def setting(key: String, default: String): String = {
    if (!exists("settings")) return default
    settings.filter(_.key == key).take(1).headOption.map(_.value).getOrElse(default)
  }

  /** GetIntSetting (service_settings.go:79-96): absent → default,
    * unparsable → error. */
  def intSetting(key: String, default: Int): Int = {
    val raw = setting(key, default.toString)
    raw.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"could not parse setting $key as int: $raw"))
  }

  /** GetInt64Setting (service_settings.go:98-115). */
  def longSetting(key: String, default: Long): Long = {
    val raw = setting(key, default.toString)
    raw.toLongOption.getOrElse(
      throw new IllegalArgumentException(s"could not parse setting $key as int64: $raw"))
  }

  /** SetSetting upsert (service_settings.go:63-77). The settings table
    * is a handful of rows — the read-modify-write collect is fine. */
  def setSetting(key: String, value: String,
      now: java.time.Instant = java.time.Instant.now()): Unit = {
    val ts = java.sql.Timestamp.from(now)
    val rows = if (exists("settings")) settings.collect().toSeq else Seq.empty
    val updated = rows.filterNot(_.key == key) :+ Model.Setting(key, value, ts)
    write("settings", spark.createDataset(updated)(MetaStore.settingEnc))
  }
}

object MetaStore {
  implicit val tableMetaEnc: Encoder[Model.TableMeta] = Encoders.product[Model.TableMeta]
  implicit val partitionStatEnc: Encoder[Model.PartitionStat] = Encoders.product[Model.PartitionStat]
  implicit val snapshotMetaEnc: Encoder[Model.SnapshotMeta] = Encoders.product[Model.SnapshotMeta]
  implicit val fileMetaEnc: Encoder[Model.FileMeta] = Encoders.product[Model.FileMeta]
  implicit val taskRowEnc: Encoder[Model.TaskRow] = Encoders.product[Model.TaskRow]
  implicit val settingEnc: Encoder[Model.Setting] = Encoders.product[Model.Setting]
  implicit val columnStatEnc: Encoder[Model.ColumnStat] = Encoders.product[Model.ColumnStat]
}
