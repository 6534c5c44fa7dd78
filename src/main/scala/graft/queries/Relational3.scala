package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Third relational batch: array aggregation, CUBE grouping sets, and
  * exact percentiles — engine-breadth shapes with DuckDB oracles.
  */
object Relational3 {

  private def money(c: Column): Column = graft.functions.ExactNumeric.money(c)

  /** Array aggregation: per order priority, the sorted distinct set of
    * order statuses plus counts. The built array is rendered to a joined
    * string — array cells are not hashable/sortable in the comparator's
    * pandas path, and the string form is engine-neutral. */
  def q44ArrayAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderpriority")
      .agg(
        array_join(sort_array(collect_set($"o_orderstatus")), ",").as("statuses"),
        countDistinct($"o_orderstatus").as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val q44Sql: String =
    """SELECT o_orderpriority,
      |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      |       count(DISTINCT o_orderstatus) AS n_statuses,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** CUBE over (returnflag, linestatus): all 4 grouping-set levels in
    * one pass with grouping ids. */
  def q45Cube(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(money($"l_quantity")).cast("double").as("qty"),
        (grouping($"l_returnflag") * 2 + grouping($"l_linestatus")).as("lvl"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("l_returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("l_linestatus"),
        $"n", $"qty", $"lvl")
      .orderBy($"lvl", $"l_returnflag", $"l_linestatus")
  }

  val q45Sql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
      |       coalesce(l_linestatus, '(all)') AS l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |       grouping(l_returnflag)*2 + grouping(l_linestatus) AS lvl
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin

  /** Exact interpolated percentiles (median, p90) of a small-integer
    * double column — interpolation arithmetic is exact in doubles, so
    * Spark `percentile` and DuckDB `quantile_cont` agree bit-for-bit. */
  def q46Percentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_quantity", lit(0.5)).as("median_qty"),
        percentile($"l_quantity", lit(0.9)).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q46Sql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS median_qty,
      |       quantile_cont(l_quantity, 0.9) AS p90_qty,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q56: per-customer order timeline — rank, previous-order date via
    * lag, day gap, and a running revenue total. The navigation-window
    * family (lag/row_number/cumulative sum) in one per-key pass: the
    * window is PARTITIONed BY customer, so state stays per-group on the
    * executors (no global window). Money runs as DECIMAL inside the
    * cumulative sum and casts to double only at output. */
  def q56OrderTimeline(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"d", $"o_orderkey")
    val wSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, d)
      .select($"o_custkey", $"o_orderkey", to_date($"o_orderdate").as("d"),
        money($"o_totalprice").as("price"))
      .withColumn("order_rank", row_number().over(w))
      .withColumn("prev_date", lag($"d", 1).over(w))
      .withColumn("gap_days", datediff($"d", $"prev_date").cast("long"))
      .withColumn("running_total", sum($"price").over(wSum).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"d".as("order_date"),
        $"order_rank", $"prev_date", $"gap_days", $"running_total")
      .orderBy($"o_custkey", $"order_rank")
  }

  val q56Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders
      |)
      |SELECT o_custkey, o_orderkey, d AS order_date,
      |       row_number() OVER w AS order_rank,
      |       lag(d) OVER w AS prev_date,
      |       CAST(date_diff('day', lag(d) OVER w, d) AS BIGINT) AS gap_days,
      |       CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
      |              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      |ORDER BY o_custkey, order_rank""".stripMargin

  /** q66: PIVOT — per-user event counts spread into one column per
    * event type (explicit value list, so no extra distinct job and a
    * stable schema at every scale factor), zero-filled. One shuffle on
    * user_id; the pivot itself is a map-side conditional aggregation. */
  def q66Pivot(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, d)
      .groupBy($"user_id")
      .pivot($"event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .orderBy($"user_id")
  }

  val q66Sql: String =
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q67: time-series gap filling — the dense per-user daily activity
    * grid: each user's [first, last] active-day span is expanded with
    * `sequence` + `explode` (no cross join against a global calendar —
    * the grid is generated per key, so a sparse user costs only their
    * own span), missing days filled with zero counts, and
    * days-since-last-activity forward-filled with a running `max` over
    * observed days (monotone, so max ≡ last non-null). */
  def q67GapFill(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, d)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val grid = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_events", coalesce($"n_events", lit(0L)))
      .withColumn("last_active",
        max(when($"n_events" > 0, $"day")).over(w))
      .withColumn("days_since_activity",
        datediff($"day", $"last_active").cast("long"))
      .select($"user_id", $"day", $"n_events", $"days_since_activity")
      .orderBy($"user_id", $"day")
  }

  val q67Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, CAST(g.day AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1) s,
      |       unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
      |                              CAST(s.d1 AS TIMESTAMP),
      |                              INTERVAL 1 DAY)) AS g(day)
      |)
      |SELECT g.user_id, g.day,
      |       coalesce(d.n_events, 0) AS n_events,
      |       CAST(date_diff('day',
      |              max(CASE WHEN d.n_events > 0 THEN g.day END)
      |                OVER (PARTITION BY g.user_id ORDER BY g.day
      |                      ROWS UNBOUNDED PRECEDING),
      |              g.day) AS BIGINT) AS days_since_activity
      |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      |ORDER BY g.user_id, g.day""".stripMargin
}
