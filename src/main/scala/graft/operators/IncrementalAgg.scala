package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.meta.MetaStore
import graft.sources.SnapshotReads

/** Incremental aggregate maintenance — a materialized rollup kept
  * current by merging DELTA partials instead of re-scanning the fact
  * table (the reference recomputes its cache tables wholesale on every
  * refresh, service_refresh.go; at 100 TB a full re-aggregation per
  * refresh cycle is the single biggest avoidable cost in that design).
  *
  * The stored state is the PARTIAL form of each measure — count, sum,
  * min, max per group — which is re-aggregable: partials from the
  * standing state and from newly-appended rows merge with the same
  * combine functions (sum+sum, min(min), max(max)), exactly like
  * Spark's own partial aggregation merges map-side combiners. Derived
  * measures that are NOT re-aggregable (avg) are finalized from
  * partials at read time (sum/count), never stored.
  *
  * Append-only increments come from the snapshot manifest
  * ([[SnapshotReads.readIncremental]]); a replace/overwrite snapshot in
  * the lineage makes "new rows" undefined, so maintenance falls back to
  * a full rebuild — the same contract Iceberg's incremental scan
  * enforces. Scale shape: the per-refresh cost is one partial-agg pass
  * over the DELTA plus a merge shuffle of two #groups-sized frames;
  * the fact table is never re-read.
  */
object IncrementalAgg {

  /** Column-name layout of the stored partial state for one measure
    * column `m`: sum_m (DECIMAL 18,2), min_m, max_m; plus one shared
    * n_rows count. */
  private def partialCols(groupCols: Seq[String], measure: String) =
    (groupCols, s"sum_$measure", s"min_$measure", s"max_$measure")

  /** One partial-agg pass over `rows`. */
  def partials(rows: DataFrame, groupCols: Seq[String], measure: String): DataFrame = {
    val (_, s, mn, mx) = partialCols(groupCols, measure)
    rows.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(graft.functions.ExactNumeric.money(col(measure))).as(s),
        min(col(measure)).as(mn),
        max(col(measure)).as(mx))
  }

  /** Merge standing partials with delta partials: the combine functions
    * of each partial aggregate, applied per group. Either side may hold
    * groups the other lacks (union semantics). */
  def merge(state: DataFrame, delta: DataFrame, groupCols: Seq[String],
      measure: String): DataFrame = {
    val (_, s, mn, mx) = partialCols(groupCols, measure)
    state.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col(s)).as(s),
        min(col(mn)).as(mn),
        max(col(mx)).as(mx))
  }

  /** Finalized view: partial state plus derived measures (avg from
    * sum/count — one double division over the exact DECIMAL sum, the
    * same single-rounding expression in any engine). */
  def finalized(state: DataFrame, measure: String): DataFrame = {
    val s = s"sum_$measure"
    state.withColumn(s"avg_$measure",
      col(s).cast("double") / col("n_rows").cast("double"))
  }

  /** Maintain the named rollup over `database.table` up to
    * `toSnapshotId`. Reads the high-water mark from the rollup's
    * sidecar state; if the increment is clean (append-only chain), one
    * delta pass + merge; otherwise a full rebuild of the pinned
    * snapshot. Returns (state, fullRebuild). */
  def refresh(store: MetaStore, database: String, table: String,
      name: String, groupCols: Seq[String], measure: String,
      toSnapshotId: Long): (DataFrame, Boolean) = {
    val spark = store.spark
    val stateTable = s"rollup_$name"
    val markTable = s"rollup_${name}_snapshot"
    val haveState = store.exists(stateTable) && store.exists(markTable)
    val fromSnapshot: Option[Long] =
      if (!haveState) None
      else store.readDf(markTable).collect().headOption.map(_.getLong(0))

    def fullRebuild(): (DataFrame, Boolean) = {
      val rows = SnapshotReads.readAt(store, database, table, toSnapshotId)
      store.write(stateTable, partials(rows, groupCols, measure), SaveMode.Overwrite)
      writeMark(store, markTable, toSnapshotId)
      (store.readDf(stateTable), true)
    }

    fromSnapshot match {
      case None => fullRebuild()
      case Some(from) if from == toSnapshotId =>
        (store.readDf(stateTable), false)
      case Some(from) =>
        val deltaRows =
          try SnapshotReads.readIncremental(store, database, table, from, toSnapshotId)
          catch { case _: IllegalArgumentException => null }
        if (deltaRows == null) fullRebuild()
        else {
          val merged = merge(store.readDf(stateTable),
            partials(deltaRows, groupCols, measure), groupCols, measure)
          store.rewrite(stateTable, merged)
          writeMark(store, markTable, toSnapshotId)
          (store.readDf(stateTable), false)
        }
    }
  }

  private def writeMark(store: MetaStore, markTable: String, snap: Long): Unit = {
    val spark = store.spark
    import spark.implicits._
    store.write(markTable, Seq(snap).toDF("snapshot_id"))
  }

  /** q87: the partial-state rollup surfaced as a query — orders by
    * priority with the finalized avg, exactly what a maintained
    * `rollup_by_priority` table would serve without touching the fact
    * table. Doubles come from exact DECIMAL sums via one cast/division
    * each, so the oracle hash-matches. */
  def q87RollupPartials(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, d)
      .select(col("o_orderpriority"), col("o_totalprice"))
    finalized(partials(orders, Seq("o_orderpriority"), "o_totalprice"), "o_totalprice")
      .select(col("o_orderpriority"), col("n_rows"),
        col("sum_o_totalprice").cast("double").as("sum_price"),
        col("min_o_totalprice").as("min_price"),
        col("max_o_totalprice").as("max_price"),
        col("avg_o_totalprice").as("avg_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q87Sql: String =
    """SELECT o_orderpriority, count(*) AS n_rows,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       min(o_totalprice) AS min_price,
      |       max(o_totalprice) AS max_price,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
}
