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

  /** Profile the named columns: one output row per column with count,
    * nulls, exact distinct count, and min/max rendered as strings
    * (string-typed and integral columns only — float formatting is not
    * portable across engines). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_present"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .withColumn("column", lit(c))
        .select($"column", $"n_rows", ($"n_rows" - $"n_present").as("n_null"),
          $"n_distinct", $"min_s", $"max_s")
    }.reduce(_.unionAll(_)).orderBy($"column")
  }

  /** Approximate profile for the scale path: HLL++ distinct estimates
    * and approximate quantiles (no cross-engine oracle — sketches
    * differ; ProfileSpec bounds the estimation error instead). */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      df.agg(
        approx_count_distinct(col(c)).as("approx_distinct"),
        count(col(c)).as("n_present"))
        .withColumn("column", lit(c))
        .select($"column", $"approx_distinct", $"n_present")
    }.reduce(_.unionAll(_)).orderBy($"column")
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
