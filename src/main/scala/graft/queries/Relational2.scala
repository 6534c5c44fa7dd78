package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational breadth beyond the reference's literal surface — the
  * query shapes a user of a general lakehouse engine runs every day:
  * outer joins with null handling, semi-joins, UNION ALL, correlated
  * scalar subqueries, and string-function pipelines. Each with an exact
  * DuckDB oracle.
  */
object Relational2 {

  private def money(c: Column): Column = graft.functions.ExactNumeric.money(c)

  /** Left outer join + null-aware aggregation: every nation with its
    * (possibly absent) high-value order stats. */
  def q35OuterJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val n = Tables.nation(spark, d)
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d).where($"o_totalprice" > 400000)
    val co = c.join(o, $"c_custkey" === $"o_custkey")
      .select($"c_nationkey", money($"o_totalprice").as("price"))
    n.join(co, $"n_nationkey" === $"c_nationkey", "left")
      .groupBy($"n_name")
      .agg(
        count($"price").as("n_big_orders"),
        coalesce(sum($"price"), lit(0).cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy($"n_name")
  }

  val q35Sql: String =
    """SELECT n_name, count(price) AS n_big_orders,
      |       CAST(coalesce(sum(price), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM nation
      |LEFT JOIN (SELECT c_nationkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |           FROM customer JOIN orders ON c_custkey = o_custkey
      |           WHERE o_totalprice > 400000) co
      |  ON n_nationkey = co.c_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Semi-join (EXISTS): customers with at least one urgent order. */
  def q36SemiJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d).where($"o_orderpriority" === "1-URGENT")
    c.join(o.select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  val q36Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** UNION ALL of differently-sourced rows + grouped recount. */
  def q37Union(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val buyers = Tables.customer(spark, d)
      .select($"c_nationkey".cast("int").as("nationkey"), lit("customer").as("role"))
    val sellers = Tables.supplier(spark, d)
      .select($"s_nationkey".cast("int").as("nationkey"), lit("supplier").as("role"))
    buyers.unionAll(sellers)
      .groupBy($"nationkey", $"role")
      .agg(count(lit(1)).as("n"))
      .orderBy($"nationkey", $"role")
  }

  val q37Sql: String =
    """SELECT nationkey, role, count(*) AS n FROM (
      |  SELECT CAST(c_nationkey AS INT) AS nationkey, 'customer' AS role FROM customer
      |  UNION ALL
      |  SELECT CAST(s_nationkey AS INT) AS nationkey, 'supplier' AS role FROM supplier
      |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems below 50%
    * of their part's average quantity. Decorrelates to a join on the
    * pre-aggregated per-part averages — expressed directly that way
    * (the plan Catalyst produces for the correlated form). */
  def q38CorrelatedAvg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, d)
    // qty < 0.5 * sum/cnt ⇔ 2*qty*cnt < sum — multiplication-only form
    // keeps the comparison exact in both engines (no decimal-division
    // rounding-rule differences). The per-group sums come from an
    // unordered window over l_partkey instead of a groupBy + join-back:
    // ONE shuffle of lineitem instead of two (the agg exchange plus the
    // re-shuffled join probe), with no sort (whole-partition frame).
    val w = Window.partitionBy($"l_partkey")
    // The inner-join form drops null-partkey rows; partitionBy would
    // group them into a null partition instead. Pin the join semantics
    // explicitly so reuse on nullable keys stays equivalent (l_partkey
    // is non-null in TPC-H, so this is a no-op filter here).
    li.where($"l_partkey".isNotNull)
      .withColumn("sum_qty", sum(money($"l_quantity")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .where(money($"l_quantity") * lit(2) * $"cnt" < $"sum_qty")
      .agg(
        count(lit(1)).as("n_small_lines"),
        sum(money($"l_extendedprice")).cast("double").as("total_price"))
  }

  val q38Sql: String =
    """WITH avg_qty AS (
      |  SELECT l_partkey AS p_key,
      |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |         count(*) AS cnt
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT count(*) AS n_small_lines,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM lineitem JOIN avg_qty ON l_partkey = p_key
      |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < sum_qty""".stripMargin

  /** String-function pipeline: substring/replace/like/length/case
    * transforms over part names. */
  def q39Strings(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, d)
      .where($"p_name".like("%green%") || $"p_name".like("%blue%"))
      .withColumn("color", when($"p_name".like("%green%"), "green").otherwise("blue"))
      .withColumn("head", upper(substring($"p_name", 1, 8)))
      .withColumn("squeezed", regexp_replace($"p_name", "[aeiou]", ""))
      .groupBy($"color")
      .agg(
        count(lit(1)).as("n_parts"),
        max(length($"p_name")).as("max_name_len"),
        min($"head").as("first_head"),
        max(length($"squeezed")).as("max_squeezed_len"))
      .orderBy($"color")
  }

  val q39Sql: String =
    """SELECT CASE WHEN p_name LIKE '%green%' THEN 'green' ELSE 'blue' END AS color,
      |       count(*) AS n_parts,
      |       max(length(p_name)) AS max_name_len,
      |       min(upper(substring(p_name, 1, 8))) AS first_head,
      |       max(length(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS max_squeezed_len
      |FROM part
      |WHERE p_name LIKE '%green%' OR p_name LIKE '%blue%'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q57 (TPC-H Q13 shape): the distribution of customers by order
    * count, including zero-order customers — left outer join + two
    * grouping levels. The outer join is the part Catalyst can't
    * broadcast-shortcut (null-producing side), so this exercises the
    * shuffled outer-join → re-aggregate path. */
  def q57OrderCountDist(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.customer(spark, d)
      .join(Tables.orders(spark, d),
        $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust
      .groupBy($"c_count")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_customers".desc, $"c_count".desc)
  }

  val q57Sql: String =
    """WITH per_cust AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1
      |)
      |SELECT c_count, count(*) AS n_customers
      |FROM per_cust GROUP BY 1
      |ORDER BY n_customers DESC, c_count DESC""".stripMargin

  /** q58 (TPC-H Q18 shape): large-volume orders — orders whose total
    * lineitem quantity exceeds a threshold, rejoined to their
    * customers. Aggregate → semi-filter → join-back. */
  def q58LargeOrders(spark: SparkSession, d: String, minQty: Int = 300): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, d)
      .groupBy($"l_orderkey")
      .agg(sum(money($"l_quantity")).as("total_qty"))
      .where($"total_qty" > minQty)
    Tables.orders(spark, d)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, d), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"o_orderkey",
        to_date($"o_orderdate").as("order_date"),
        money($"o_totalprice").cast("double").as("o_totalprice"),
        $"total_qty".cast("double").as("total_qty"))
      .orderBy($"total_qty".desc, $"o_orderkey".asc)
  }

  def q58Sql(minQty: Int): String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $minQty
       |)
       |SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       |       CAST(total_qty AS DOUBLE) AS total_qty
       |FROM orders
       |JOIN big ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin
}
