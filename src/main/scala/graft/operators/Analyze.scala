package graft.operators

import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.meta.{MetaStore, Model}

/** ANALYZE — persist per-column table statistics into the MetaStore,
  * the engine analog of Iceberg's `compute_table_stats` procedure (an
  * extension over the reference surface; its MySQL cache stores only
  * partition-level stats). Planners read the stored stats to pick
  * broadcast sides and detect skew; dashboards read them for data
  * quality.
  *
  * All columns are computed together ([[Profile.computeStats]]: one
  * scan for the non-distinct aggregates plus one melted pair-distinct
  * job for exact cardinalities — never a scan per column, never a
  * multi-countDistinct Expand). The exact path
  * (`countDistinct`) is oracle-grade; the approximate path (HLL++
  * `approx_count_distinct`) is the 100 TB default — an exact distinct
  * on a high-cardinality column is itself a full shuffle of the
  * column.
  *
  * Stats merge per (database, table, analyzed column): re-analyzing a
  * COLUMN SUBSET replaces only those columns' rows, leaving the
  * table's other columns — and every other table — untouched. The
  * merge is an anti-join union rewrite (never a driver-side collect of
  * the stats table).
  */
object Analyze {

  /** Compute stats for `cols` of `df` (one scan for all of them) and
    * merge them into the store's `column_stats` table. Returns the new
    * rows. */
  def analyzeTable(store: MetaStore, database: String, table: String,
      df: DataFrame, cols: Seq[String], approximate: Boolean = false,
      now: Instant = Instant.now()): Seq[Model.ColumnStat] = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val ts = java.sql.Timestamp.from(now)
    val s = Profile.computeStats(df, cols, approximate)
    val stats = cols.map { c =>
      Model.ColumnStat(database, table, c,
        nRows = s.nRows,
        nNull = s.nRows - s.present(c),
        nDistinct = s.distinct(c),
        approximate = approximate,
        minValue = s.minS.get(c),
        maxValue = s.maxS.get(c),
        computedAt = ts)
    }
    merge(store, database, table, stats)
    stats
  }

  /** Replace the (database, table, column ∈ analyzed) slice of
    * `column_stats` with `stats` — distributed anti-join rewrite, fine
    * at any stats-table size. */
  private def merge(store: MetaStore, database: String, table: String,
      stats: Seq[Model.ColumnStat]): Unit = {
    val spark = store.spark
    import spark.implicits._
    import MetaStore.columnStatEnc
    val fresh = spark.createDataset(stats)
    val analyzed = stats.map(_.column)
    val merged =
      if (!store.exists("column_stats")) fresh
      else store.columnStats
        .where(!($"database" === database && $"table" === table &&
          $"column".isin(analyzed: _*)))
        .unionByName(fresh)
    store.rewrite("column_stats", merged)
  }
}
