package graft.sources

import org.apache.spark.sql.DataFrame

import graft.meta.MetaStore

/** Snapshot-pinned data reads — `VERSION AS OF` over the engine's
  * snapshot model (SURVEY.md §7.4 #2: model Iceberg's lineage with
  * MetaStore rows + per-snapshot file manifests when no table-format
  * runtime is present).
  *
  * File planning happens on the driver from the (small) manifest rows —
  * exactly how table formats plan scans — and the data read itself is a
  * plain distributed parquet scan of the planned files.
  */
object SnapshotReads {

  /** Read the table as of `snapshotId`: plan the snapshot's data files
    * from the manifest, scan them. */
  def readAt(store: MetaStore, database: String, table: String, snapshotId: Long): DataFrame = {
    val paths = store.files
      .filter(f => f.database == database && f.table == table &&
        f.snapshotId == snapshotId && f.content == 0)
      .collect().map(_.filePath).sorted
    require(paths.nonEmpty, s"no data files manifested for $database.$table@$snapshotId")
    store.spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** Read the current snapshot per the tables pointer. */
  def readCurrent(store: MetaStore, database: String, table: String): DataFrame = {
    val current = store.tables
      .filter(t => t.database == database && t.name == table)
      .collect().headOption
      .flatMap(_.currentSnapshotId)
      .getOrElse(throw new IllegalStateException(s"$database.$table has no current snapshot"))
    readAt(store, database, table, current)
  }
}
