package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read ROW DELETES — Iceberg v2's delete-file semantics
  * re-expressed on plain Spark (spec reference: the format's
  * equality/position delete files that `rewrite_data_files` /
  * `rewrite_position_delete_files` compact, the machinery the
  * reference's maintenance procedures drive; reference
  * maintenance.py:153-215 issues those CALLs).
  *
  * Two delete shapes, both read-side anti-joins (no rewrite until
  * [[materialize]]):
  *
  *  - EQUALITY deletes: "every row whose key tuple equals one of
  *    these" — the CDC/GDPR shape. NULL-safe on purpose: a delete row
  *    with a NULL key column matches data NULLs (`<=>`), because an
  *    equality delete that silently skips NULL keys un-deletes exactly
  *    the rows nobody can address otherwise. Optional SEQUENCE rule:
  *    with `dataSeq`/`deleteSeq` bound, a delete applies only to data
  *    rows with `dataSeq < deleteSeq` — rows written AFTER the delete
  *    survive, which is what makes re-inserting a deleted key sound
  *    (Iceberg's sequence-number rule).
  *  - POSITIONAL deletes: "(file, row ordinal)" pairs against the
  *    physical layout, built by [[positionsOf]] from Spark's
  *    `_metadata.file_path`/`_metadata.row_index` columns — no row ids
  *    needed in the data.
  *
  * 100 TB: delete files are typically tiny next to the table —
  * Catalyst/AQE broadcasts the anti-join build side, so a MOR read
  * costs one scan plus a broadcast probe, never a shuffle of the
  * table. The read-side cost compounds per query, which is why
  * [[materialize]] (the rewrite-data-files step) exists; its output
  * is spec-pinned equal to the MOR view it replaces.
  */
object RowDeletes {

  /** The table with equality deletes applied. `keys` name columns
    * present in BOTH frames. */
  def applyEqualityDeletes(table: DataFrame, deletes: DataFrame,
      keys: Seq[String], dataSeq: Option[String] = None,
      deleteSeq: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "at least one equality-delete key column")
    require(dataSeq.isEmpty == deleteSeq.isEmpty,
      "bind both dataSeq and deleteSeq, or neither")
    val d = deletes.select(
      (keys.map(k => col(k).as(s"__d_$k")) ++
        deleteSeq.map(s => col(s).as("__d_seq"))): _*).distinct()
    val keyEq = keys.map(k => table(k) <=> d(s"__d_$k")).reduce(_ && _)
    val cond = dataSeq.fold(keyEq)(s => keyEq && table(s) < d("__d_seq"))
    table.join(d, cond, "left_anti")
  }

  /** Positional delete rows for the data rows matching `pred`: the
    * (file_path, row_index) pairs the physical layout addresses them
    * by. `table` must come straight from a file source — the hidden
    * `_metadata` column does not survive joins/aggregations. */
  def positionsOf(table: DataFrame, pred: Column): DataFrame =
    table.where(pred).select(
      col("_metadata.file_path").as("file_path"),
      col("_metadata.row_index").as("row_index"))

  /** The table with positional deletes applied. Same file-source
    * caveat as [[positionsOf]]; the delete frame's `file_path` must be
    * strings captured from the same source (both sides render Spark's
    * canonical `file:/...` form, so equality is exact). */
  def applyPositionalDeletes(table: DataFrame, deletes: DataFrame): DataFrame = {
    val d = deletes.select(col("file_path").as("__d_fp"),
      col("row_index").as("__d_ri")).distinct()
    table
      .withColumn("__fp", col("_metadata.file_path"))
      .withColumn("__ri", col("_metadata.row_index"))
      .join(d, col("__fp") === col("__d_fp") && col("__ri") === col("__d_ri"),
        "left_anti")
      .drop("__fp", "__ri")
  }

  /** The rewrite-data-files step: persist the MOR view as clean
    * parquet, after which readers drop the per-query anti-join.
    * Returns (rows written, rows deleted). */
  def materialize(mor: DataFrame, table: DataFrame, outPath: String): (Long, Long) = {
    mor.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outPath)
    val written = mor.sparkSession.read.parquet(outPath).count()
    (written, table.count() - written)
  }

  // ---- q162: equality-delete MOR read, hash-checked ------------------

  /** q162: lineitem read through an equality-delete file derived from
    * finished orders (the CDC/GDPR erasure shape: "remove every line
    * of these orders"), aggregated. The DuckDB oracle states the same
    * anti-semantics with NOT EXISTS on the raw tables — the MOR path
    * must be semantically invisible. */
  def q162EqualityDeletes(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val deletes = graft.sources.Tables.orders(spark, d)
      .where($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val mor = applyEqualityDeletes(
      graft.sources.Tables.lineitem(spark, d), deletes, Seq("l_orderkey"))
    mor.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy($"l_returnflag")
  }

  val q162Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey
      |                    AND o.o_orderstatus = 'F')
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
