package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational operator surface from SURVEY.md §2 (scans, filters, joins,
  * aggregations, windows, sorts, set ops), expressed over the TESTDATA
  * tables so each query has an exact DuckDB oracle.
  *
  * Numeric-parity rules (oracle hashes values):
  *  - money columns are exact 2-decimal values stored as double → cast each
  *    value to DECIMAL(18,2) *before* aggregating: decimal sums are exact
  *    and identical across engines, double sums are not.
  *  - never emit raw doubles from float arithmetic; round at a scale far
  *    below the accumulated error only when arithmetic is exact.
  *  - all outputs carry deterministic ORDER BY with a unique tiebreak.
  *
  * Scale notes (100 TB posture): every aggregation here is a single
  * hash-aggregate with map-side partial aggregation; joins against dims
  * (region/nation/supplier/part at any SF) are broadcast; fact-fact joins
  * shuffle on the join key once. AQE handles skew/partition coalescing.
  */
object Relational {

  private def money(c: Column): Column = graft.functions.ExactNumeric.money(c)

  /** A1 table-summary-shaped agg (ref: service_metadata.go:36-66):
    * grouped COUNT/SUM/COALESCE over the big fact table. TPC-H Q1 shape.
    * Output types are {string,long,double} only: decimal sums are exact,
    * then cast to double so both engines serialize the identical value
    * (the comparator renders parquet decimals and engine decimals
    * differently); dates are formatted to strings for the same reason. */
  def q1Agg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(money($"l_quantity")).cast("double").as("sum_qty"),
        sum(money($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(money($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - money($"l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        date_format(max($"l_shipdate"), "yyyy-MM-dd").as("last_ship"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A2 partition drill-down (ref: handler_browse.go:137-178): given a
    * selected year, roll up the next partition level (month) with
    * SUM(file/record/bytes) + needs_optimize counts. Partition columns are
    * derived from l_shipdate exactly like the reference's hidden day
    * transform (F1: date_format yyyy/MM/dd). */
  def q2Drilldown(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .withColumn("year", date_format($"l_shipdate", "yyyy"))
      .withColumn("month", date_format($"l_shipdate", "MM"))
      .where($"year" === "1996")
      .groupBy($"month")
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct($"l_orderkey").as("file_count"),
        sum(money($"l_extendedprice")).cast("double").as("total_bytes"))
      .orderBy($"month")
  }

  val q2Sql: String =
    """SELECT strftime(l_shipdate, '%m') AS month,
      |  count(*) AS record_count,
      |  count(DISTINCT l_orderkey) AS file_count,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_bytes
      |FROM lineitem WHERE strftime(l_shipdate, '%Y') = '1996'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** J1 stale-table anti-join (ref: service_refresh.go:82-88): rows present
    * in the cache side but absent from the live side → left_anti. Here:
    * customers that have no orders. Broadcast is wrong here (both sides
    * scale with SF) → shuffled hash/SMJ on the key, which Catalyst picks. */
  def q3AntiJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
      .where($"o_orderdate" < lit("1996-01-01").cast("date"))
      .select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q3Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate < DATE '1996-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** S8+O1 files-browse (ref: service_browse_files.go:193-215): filtered
    * scan + multi-key sort ORDER BY size DESC, path ASC, with the filter +
    * projection pushed into the parquet scan. */
  def q4FilesBrowse(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .where($"l_returnflag" === "R" && $"l_linestatus" === "F")
      .select(
        $"l_orderkey", $"l_linenumber",
        money($"l_extendedprice").cast("double").as("file_size"),
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"))
      .orderBy($"file_size".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      .limit(500)
  }

  val q4Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS file_size,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
      |ORDER BY file_size DESC, l_orderkey ASC, l_linenumber ASC LIMIT 500""".stripMargin

  /** §2.5 window: latest-snapshot-per-table analog — latest event per user
    * via row_number() over (partition by user order by ts desc). */
  def q5LatestPerKey(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy($"user_id")
  }

  val q5Sql: String =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      |      FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** O2/A5 pagination (ref: service_task_queue.go:489-504): ORDER BY ts
    * DESC LIMIT n OFFSET m.
    *
    * Scale shape: `orderBy().limit(offset+n)` plans as
    * TakeOrderedAndProject — each partition keeps a bounded top-(offset+n)
    * heap and only those rows reach the driver; no global-window
    * single-partition shuffle of the whole fact table (which Spark itself
    * warns about). Row numbers are then assigned by zipWithIndex over the
    * already-sorted bounded page, so no partition-less WindowExec appears
    * anywhere in the plan. For deep offsets a real service would switch to
    * keyset pagination (`WHERE (o_orderdate, o_orderkey) < last_seen`);
    * the offset form is kept because it is the reference's API shape. */
  def q6Page(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val offset = 100
    val n = 20
    val top = Tables.orders(spark, d)
      .select($"o_orderkey", $"o_orderstatus",
        money($"o_totalprice").cast("double").as("total_price"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
      .orderBy($"order_date".desc, $"o_orderkey".desc)
      .limit(offset + n)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("rn",
        org.apache.spark.sql.types.LongType, nullable = false) +: top.schema.fields)
    // TakeOrderedAndProject yields one ordered partition of ≤ offset+n
    // rows; zipWithIndex indexes in that order.
    val rows = top.rdd.zipWithIndex()
      .filter(_._2 >= offset)
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq((i + 1) +: r.toSeq) }
    spark.createDataFrame(rows, schema).orderBy($"rn")
  }

  val q6Sql: String =
    """SELECT rn, o_orderkey, o_orderstatus,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM (SELECT *, row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) rn FROM orders)
      |WHERE rn > 100 AND rn <= 120 ORDER BY rn""".stripMargin

  /** Multi-join star aggregation (TPC-H Q5 shape): revenue per nation.
    * Dims (nation/region) broadcast; fact-fact joins shuffle once on the
    * shared key. This is the bench headline join. */
  def q7JoinAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        sum(money($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - money($"l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q7Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** §2.7 set ops: EXCEPT — nations with customers but no high-balance
    * suppliers (ref J1/J2 are EXCEPT-equivalents, service_refresh.go:82-88). */
  def q8SetOps(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val withCust = Tables.customer(spark, d).select($"c_nationkey".cast("int").as("nationkey")).distinct()
    val withSupp = Tables.supplier(spark, d).where($"s_acctbal" > 9900)
      .select($"s_nationkey".cast("int").as("nationkey")).distinct()
    withCust.except(withSupp).orderBy($"nationkey")
  }

  val q8Sql: String =
    """SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer
      |EXCEPT
      |SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier WHERE s_acctbal > 9900
      |ORDER BY nationkey""".stripMargin

  /** P3/P4 predicates: IN-list + range on derived date (ref:
    * service_tasks.go:247-248, service_task_queue.go:478-501). */
  def q9Predicates(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .where($"o_orderstatus".isin("F", "P") &&
        $"o_orderdate".cast("date").between("1996-01-01", "1996-12-31"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(money($"o_totalprice")).cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  val q9Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderstatus IN ('F','P')
      |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** A2-alt: one-pass ROLLUP over (year, month) replacing the reference's
    * level-at-a-time drill-down loop — the Spark-first rewrite. Subtotal
    * rows' NULL keys are coalesced to '(all)' (pandas renders engine NULLs
    * inconsistently across parquet/native results). */
  def q10Rollup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .withColumn("year", date_format($"o_orderdate", "yyyy"))
      .withColumn("month", date_format($"o_orderdate", "MM"))
      .rollup($"year", $"month")
      .agg(count(lit(1)).as("n_orders"), sum(money($"o_totalprice")).cast("double").as("total"),
        (grouping($"year") * 2 + grouping($"month")).as("lvl"))
      .select(coalesce($"year", lit("(all)")).as("year"),
        coalesce($"month", lit("(all)")).as("month"),
        $"n_orders", $"total", $"lvl")
      .orderBy($"lvl", $"year", $"month")
  }

  val q10Sql: String =
    """SELECT coalesce(strftime(o_orderdate,'%Y'), '(all)') AS year,
      |  coalesce(strftime(o_orderdate,'%m'), '(all)') AS month,
      |  count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  grouping(strftime(o_orderdate,'%Y'))*2 + grouping(strftime(o_orderdate,'%m')) AS lvl
      |FROM orders GROUP BY ROLLUP(strftime(o_orderdate,'%Y'), strftime(o_orderdate,'%m'))
      |ORDER BY lvl, year, month""".stripMargin
}
