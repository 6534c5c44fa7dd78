package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Column profiling — the table-statistics surface a lakehouse admin
  * runs before planning maintenance (row counts, null ratios, exact
  * cardinalities, value bounds). One aggregate job per profiled column,
  * unioned; each agg is a single shuffle with map-side partials.
  *
  * Approximate variants (approx_count_distinct / percentile_approx)
  * exist for the 100 TB path — exact distinct on a high-cardinality
  * column is itself a full shuffle — but the oracle-checked query uses
  * exact counts (sketch internals differ across engines).
  */
object Profile {

  /** ALL columns' stats in ONE pass: a single agg flattening the
    * per-column aggregates — one scan, one shuffle, regardless of how
    * many columns are profiled (N separate aggs would re-read the
    * whole table N times). Shared by [[profile]], [[approxProfile]],
    * and [[Analyze]]. */
  def statsRow(df: DataFrame, cols: Seq[String],
      approximate: Boolean): org.apache.spark.sql.Row = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__p_$c"),
        (if (approximate) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(count(lit(1)).as("__n_rows"), aggs: _*).collect().head
  }

  /** Profile the named columns: one output row per column with count,
    * nulls, exact distinct count, and min/max rendered as strings
    * (string-typed and integral columns only — float formatting is not
    * portable across engines). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = statsRow(df, cols, approximate = false)
    val n = r.getAs[Long]("__n_rows")
    cols.map(c => (c, n, n - r.getAs[Long](s"__p_$c"), r.getAs[Long](s"__d_$c"),
        r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c")))
      .toDF("column", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
      .orderBy($"column")
  }

  /** Approximate profile for the scale path: HLL++ distinct estimates
    * (no cross-engine oracle — sketches differ; ProfileSpec bounds the
    * estimation error instead). */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = statsRow(df, cols, approximate = true)
    cols.map(c => (c, r.getAs[Long](s"__d_$c"), r.getAs[Long](s"__p_$c")))
      .toDF("column", "approx_distinct", "n_present")
      .orderBy($"column")
  }

  def q42Profile(spark: SparkSession, d: String): DataFrame =
    profile(Tables.orders(spark, d),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  val q42Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |       count(*) - count($c) AS n_null,
         |       count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_s,
         |       CAST(max($c) AS VARCHAR) AS max_s
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }
}
