package graft.meta

import java.sql.Timestamp

/** Engine-internal metadata model (SURVEY.md §1.1, FIXTURES.md §1).
  *
  * These case classes mirror the reference's MySQL cache rows
  * (reference: backend/internal/types.go:20-111 and
  * backend/build/migrations/20260107000000_iceberg_native_refresh.sql),
  * re-expressed as Spark `Dataset[T]` row types. Partition keys are
  * `Map[String,String]` (= the reference's `PartitionValues`,
  * backend/internal/types_iceberg.go:59).
  */
object Model {

  /** One column of a table schema (types.go:66-69). */
  final case class TableColumn(name: String, `type`: String)

  /** Hidden-transform info of an expanded partition field
    * (types.go:76-81). */
  final case class HiddenTransform(column: String, `type`: String)

  /** One logical partition field after spec expansion (types.go:71-81):
    * hidden time transforms expand day(c) → year/month/day etc.
    * (iceberg_client.go:476-496). */
  final case class PartitionField(
      name: String,
      rawFieldName: String,
      isHidden: Boolean,
      hidden: Option[HiddenTransform])

  /** Cached table description (types.go:55-62). */
  final case class TableMeta(
      database: String,
      name: String,
      columns: Seq[TableColumn],
      partitions: Seq[PartitionField],
      currentSnapshotId: Option[Long],
      updatedAt: Timestamp)

  /** Per-partition stats row (types.go:31-42). */
  final case class PartitionStat(
      database: String,
      table: String,
      partition: Map[String, String],
      specId: Int,
      recordCount: Long,
      fileCount: Long,
      totalDataFileSizeInBytes: Long,
      lastUpdatedAt: Timestamp,
      lastUpdatedSnapshotId: Long,
      needsOptimize: Boolean)

  /** Snapshot lineage row (types.go:20-29). */
  final case class SnapshotMeta(
      database: String,
      table: String,
      committedAt: Timestamp,
      snapshotId: Long,
      parentId: Option[Long],
      operation: String,
      manifestList: String,
      summary: Map[String, String])

  /** `$files`-shaped data-file row (handler_browse.go:48-56). */
  final case class FileMeta(
      database: String,
      table: String,
      snapshotId: Long,
      content: Int,
      filePath: String,
      fileFormat: String,
      specId: Int,
      partition: Map[String, String],
      recordCount: Long,
      fileSizeInBytes: Long)

  object TaskKind {
    val ExpireSnapshots = "expire_snapshots"
    val RemoveOrphanFiles = "remove_orphan_files"
    val Optimize = "optimize"
    val all: Set[String] = Set(ExpireSnapshots, RemoveOrphanFiles, Optimize)
  }

  object TaskStatus {
    val Queued = "queued"
    val Running = "running"
    val Success = "success"
    val Error = "error"
    val all: Set[String] = Set(Queued, Running, Success, Error)
  }

  /** Maintenance task queue row (types.go:97-111,
    * migrations/20260206000000_unify_task_queue.sql). */
  final case class TaskRow(
      id: Long,
      database: String,
      table: String,
      kind: String,
      engine: String,
      startedAt: Timestamp,
      pickedUpAt: Option[Timestamp],
      finishedAt: Option[Timestamp],
      status: String,
      retried: Boolean,
      errorMessage: Option[String],
      input: Map[String, String],
      result: Map[String, String])

  /** Settings row (service_settings.go:30-34). */
  final case class Setting(key: String, value: String, updatedAt: Timestamp)

  /** One profiled column of a table — the engine's ANALYZE output
    * (an extension over the reference surface, in the spirit of
    * Iceberg's compute_table_stats): exact or sketch-based distinct
    * counts plus bounds, persisted for planners and dashboards. */
  final case class ColumnStat(
      database: String,
      table: String,
      column: String,
      nRows: Long,
      nNull: Long,
      nDistinct: Long,
      approximate: Boolean,
      minValue: Option[String],
      maxValue: Option[String],
      computedAt: Timestamp)

  /** Shipped setting defaults (service_settings.go:15-23). */
  object Defaults {
    val TaskConcurrency = 1
    val SmallFileThresholdBytes: Long = 256L * 1024 * 1024
    val SmallFileMinCount = 2
    val SmallFileMinSharePercent = 25
    val NeedsOptimizeDelayHours = 96
    val TargetFileSizeMb = 512
    val MinRetentionDays = 7
  }
}
