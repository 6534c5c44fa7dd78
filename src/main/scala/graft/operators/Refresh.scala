package graft.operators

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.meta.{MetaStore, Model, PartitionModel, SmallFiles}

/** M5: the catalog → MetaStore refresh ETL (reference
  * service_refresh.go): per table, rebuild the `tables` row and the
  * `partitions`/`snapshots` slices; tables present in the store but
  * absent from the live catalog are cascade-deleted (J1 stale diff,
  * service_refresh.go:82-88, 297-316).
  *
  * The "live catalog" here is a directory of parquet tables (TESTDATA
  * layout); with a real Iceberg catalog the describe/scan calls swap to
  * `spark.catalog` + `.files`/`.snapshots` metadata tables behind the
  * same interface.
  */
object Refresh {

  /** Describe one live parquet table into a `tables` row. The snapshot
    * pointer of an existing row is PRESERVED — refresh rebuilds the
    * description, it does not abandon manifest lineage (resetting it
    * broke the next expire/commit on manifest-tracked tables). */
  private def describeRow(store: MetaStore, database: String, name: String,
      dataPath: String, now: Instant,
      existing: Seq[Model.TableMeta]): Model.TableMeta = {
    val df = store.spark.read.parquet(dataPath)
    val columns = df.schema.fields.toSeq.map(f =>
      Model.TableColumn(f.name, f.dataType.simpleString))
    val prior = existing.find(t => t.database == database && t.name == name)
    Model.TableMeta(database, name, columns,
      partitions = prior.map(_.partitions).getOrElse(Seq.empty),
      currentSnapshotId = prior.flatMap(_.currentSnapshotId),
      updatedAt = Timestamp.from(now))
  }

  /** Describe + refresh one live parquet table into the store. */
  def refreshTable(store: MetaStore, database: String, name: String,
      dataPath: String, now: Instant): Unit = {
    val spark = store.spark
    import spark.implicits._
    import MetaStore._
    val existing = store.tables.collect().toSeq
    val row = describeRow(store, database, name, dataPath, now, existing)
    store.write("tables", spark.createDataset(
      existing.filterNot(t => t.database == database && t.name == name) :+ row))
  }

  /** Full refresh: refresh every live table, then cascade-delete stale
    * store entries (tables/partitions/snapshots/files for (db, name)
    * pairs no longer live). */
  def fullRefresh(store: MetaStore, database: String,
      liveTables: Map[String, String], now: Instant): Seq[(String, String)] = {
    val spark = store.spark
    import spark.implicits._
    import MetaStore._

    // one read + one write for the whole batch, not a collect/overwrite
    // cycle per table
    val existing = store.tables.collect().toSeq
    val refreshed = liveTables.toSeq.sortBy(_._1).map { case (name, path) =>
      describeRow(store, database, name, path, now, existing)
    }
    val untouched = existing.filterNot(t =>
      t.database == database && liveTables.contains(t.name))
    store.write("tables", spark.createDataset(untouched ++ refreshed))

    // J1 stale diff: stored minus live → cascade delete. The `tables`
    // slice is control-plane-small (one row per table) so the stale list
    // itself may collect; the dependent slices — `files` especially, which
    // is millions–billions of rows at 100 TB — are deleted as a
    // broadcast anti-join + distributed rewrite, never on the driver.
    val live = liveTables.keySet
    val stale = store.tables.collect().toSeq
      .filter(t => t.database == database && !live.contains(t.name))
      .map(t => (t.database, t.name))
    if (stale.nonEmpty) {
      import org.apache.spark.sql.functions.broadcast
      val staleSet = stale.toSet
      val staleDf = spark.createDataset(stale).toDF("database", "table")
      store.write("tables", spark.createDataset(
        store.tables.collect().toSeq.filterNot(t => staleSet((t.database, t.name)))))
      if (store.exists("partitions"))
        store.rewrite("partitions", store.partitions.toDF()
          .join(broadcast(staleDf), Seq("database", "table"), "left_anti")
          .as[Model.PartitionStat])
      if (store.exists("snapshots"))
        store.rewrite("snapshots", store.snapshots.toDF()
          .join(broadcast(staleDf), Seq("database", "table"), "left_anti")
          .as[Model.SnapshotMeta])
      if (store.exists("files"))
        store.rewrite("files", store.files.toDF()
          .join(broadcast(staleDf), Seq("database", "table"), "left_anti")
          .as[Model.FileMeta])
    }
    stale
  }

  /** Rebuild the `partitions` slice of one table from a `files`-shaped
    * manifest already in the store (the reference's ListPartitions +
    * needs_optimize scoring, service_iceberg.go:117-170). */
  def refreshPartitions(store: MetaStore, database: String, table: String,
      snapshotId: Long, cfg: SmallFiles.Config, now: Instant): Unit =
    Maintenance.rollbackToSnapshot(store, database, table, snapshotId, cfg, now)

  /** Expand a table's partition-spec (the reference DescribeTable path,
    * S4) — surfaced here so spec expansion is part of refresh. */
  def describePartitionSpec(fields: Seq[PartitionModel.SpecField]): Either[String, Seq[Model.PartitionField]] =
    PartitionModel.expandSpec(fields)
}
