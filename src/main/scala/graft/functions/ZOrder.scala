package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-column data clustering —
  * the sort key behind `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(a, b)')` in Iceberg and OPTIMIZE ZORDER BY in
  * Delta.
  *
  * Sorting a file by one column makes that column's parquet min/max
  * stats selective and leaves every other column's ranges full-width;
  * sorting by the interleaved z-value shrinks the per-file ranges of
  * ALL participating columns at once, so scans filtering on any of
  * them prune files. Each column is min/max-scaled to a `Bits`-bit
  * integer and the bits are interleaved round-robin — a pure
  * `Column` expression (codegen'd, no UDF).
  */
object ZOrder {

  /** Bits per column in the interleave. 16 bits ≈ 65k distinct cells
    * per dimension — far finer than file-level stats can exploit, and
    * 2-3 columns stay well inside a long's 64 bits. */
  val Bits = 16

  /** The z-value expression for columns with known [min, max] ranges
    * (pass literals gathered from a stats pass over the data being
    * rewritten). */
  def zvalue(cols: Seq[(Column, Double, Double)]): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * Bits <= 63, s"at most ${63 / Bits} z-order columns")
    val maxCell = (1L << Bits) - 1
    val scaled = cols.map { case (c, mn, mx) =>
      val range = if (mx > mn) mx - mn else 1.0
      least(
        greatest(
          (((c.cast("double") - lit(mn)) / lit(range)) * lit(maxCell.toDouble))
            .cast("long"),
          lit(0L)),
        lit(maxCell))
    }
    val n = cols.size
    val terms = for {
      b <- 0 until Bits
      i <- 0 until n
    } yield shiftleft(shiftright(scaled(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce[Column](_.bitwiseOR(_))
  }

  /** Gather [min, max] of each named column in one aggregate pass and
    * build the z-value expression over them. */
  def zvalueOf(df: DataFrame, colNames: Seq[String]): Column = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    zvalue(colNames.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"z-order column '$c' has no non-null values in the rewrite slice")
      (col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1))
    })
  }
}
