package graft.operators

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, Model}

/** ANALYZE — persist per-column table statistics into the MetaStore,
  * the engine analog of Iceberg's `compute_table_stats` procedure (an
  * extension over the reference surface; its MySQL cache stores only
  * partition-level stats). Planners read the stored stats to pick
  * broadcast sides and detect skew; dashboards read them for data
  * quality.
  *
  * One aggregate pass per column over the data (all columns share a
  * scan per agg; each agg is one shuffle with map-side partials). The
  * exact path (`countDistinct`) is oracle-grade; the approximate path
  * (HLL++ `approx_count_distinct`) is the 100 TB default — an exact
  * distinct on a high-cardinality column is itself a full shuffle of
  * the column.
  *
  * Stats merge per (database, table): re-analyzing a table replaces
  * its rows and leaves every other table's stats untouched — the same
  * slice-overwrite semantics as the refresh ETL, expressed as an
  * anti-join union rewrite (never a driver-side collect of the stats
  * table).
  */
object Analyze {

  /** Compute stats for `cols` of `df` and merge them into the store's
    * `column_stats` table. Returns the new rows. */
  def analyzeTable(store: MetaStore, database: String, table: String,
      df: DataFrame, cols: Seq[String], approximate: Boolean = false,
      now: Instant = Instant.now()): Seq[Model.ColumnStat] = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val ts = java.sql.Timestamp.from(now)
    val stats = cols.map { c =>
      val distinctAgg =
        if (approximate) approx_count_distinct(col(c)).as("n_distinct")
        else countDistinct(col(c)).as("n_distinct")
      val row = df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_present"),
        distinctAgg,
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s")).collect().head
      Model.ColumnStat(database, table, c,
        nRows = row.getAs[Long]("n_rows"),
        nNull = row.getAs[Long]("n_rows") - row.getAs[Long]("n_present"),
        nDistinct = row.getAs[Long]("n_distinct"),
        approximate = approximate,
        minValue = Option(row.getAs[String]("min_s")),
        maxValue = Option(row.getAs[String]("max_s")),
        computedAt = ts)
    }
    merge(store, database, table, stats)
    stats
  }

  /** Replace the (database, table) slice of `column_stats` with `stats`
    * — distributed anti-join rewrite, fine at any stats-table size. */
  private def merge(store: MetaStore, database: String, table: String,
      stats: Seq[Model.ColumnStat]): Unit = {
    val spark = store.spark
    import spark.implicits._
    import MetaStore.columnStatEnc
    val fresh = spark.createDataset(stats)
    val merged =
      if (!store.exists("column_stats")) fresh
      else store.columnStats
        .where(!($"database" === database && $"table" === table))
        .unionByName(fresh)
    store.rewrite("column_stats", merged)
  }
}
