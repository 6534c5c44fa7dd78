package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ExactNumeric.money
import graft.sources.Tables

/** Round-9 relational breadth: the remaining classic TPC-H plan shapes
  * this schema supports — disjunctive multi-column predicates (Q19) and
  * NOT-IN with grouped distinct counts (Q16).
  */
object Relational5 {

  /** q137: TPC-H Q19 shape — revenue under an OR-of-ANDs predicate
    * spanning BOTH join sides (brand/size from part, quantity from
    * lineitem). The planner shape under test: the disjunction can't be
    * pushed below the join whole, but its single-side residuals can
    * (any qualifying row has p_size ≥ 1 and l_quantity ≤ 30), and the
    * join itself stays a broadcast of the small dim. Money stays in
    * DECIMAL until the final cast — the q1 discipline. */
  def q137DisjunctiveRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, d)
    val p = Tables.part(spark, d)
    val cond =
      ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
      ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
      ($"p_brand" === "Brand#3"  && $"p_size".between(1, 35) && $"l_quantity".between(20, 30))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .where(cond)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(money($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - money($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"p_brand")
  }

  val q137Sql: String =
    """SELECT p_brand, count(*) AS n_lines,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |            AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY 1 ORDER BY p_brand""".stripMargin

  /** q138: TPC-H Q16 shape — per (brand, type, size) the number of
    * DISTINCT suppliers able to ship the part, excluding a denylist
    * (negative-balance suppliers standing in for Q16's complaint
    * filter) via NOT IN/anti-join. Supplier linkage comes from the
    * fact table (this schema has no partsupp). The denylist is a
    * broadcast anti-join; the distinct count is one partial-agg
    * distinct on bounded (part-attrs, suppkey) pairs. */
  def q138SupplierBreadth(spark: SparkSession, d: String, topN: Int = 30): DataFrame = {
    import spark.implicits._
    val links = Tables.lineitem(spark, d).select($"l_partkey", $"l_suppkey")
    val p = Tables.part(spark, d)
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val bad = Tables.supplier(spark, d)
      .where(money($"s_acctbal") < 0).select($"s_suppkey")
    links.join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand".asc, $"p_type".asc, $"p_size".asc)
      .limit(topN)
  }

  def q138Sql(topN: Int = 30): String =
    s"""SELECT p_brand, p_type, p_size,
       |       count(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE l_suppkey NOT IN (
       |  SELECT s_suppkey FROM supplier WHERE CAST(s_acctbal AS DECIMAL(18,2)) < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
       |LIMIT $topN""".stripMargin

  /** q144: TPC-H Q2 shape — for every small part, the region-eligible
    * supplier(s) selling it at the minimum observed price (supplier
    * linkage from the fact table; this schema has no partsupp). The
    * classic correlated-min: Q2's scalar subquery becomes ONE window
    * min over the offers frame partitioned by part — a single scan
    * and a single shuffle on partkey, where the naive groupBy+join-back
    * would scan and shuffle the offers lineage twice. All dims
    * (supplier→nation→region chain, part filter) broadcast; the price
    * equality is DECIMAL-exact on both engines, cast to DOUBLE only on
    * output. Ties (several suppliers at the min) all survive, like Q2. */
  def q144MinCostSupplier(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val eligible = Tables.supplier(spark, d)
      .join(broadcast(Tables.nation(spark, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, d).where($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val p = Tables.part(spark, d).where($"p_size" <= 10)
      .select($"p_partkey", $"p_name")
    val offers = Tables.lineitem(spark, d)
      .select($"l_partkey", $"l_suppkey", money($"l_extendedprice").as("price"))
      .join(broadcast(eligible), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
    offers
      .withColumn("mn", min($"price").over(Window.partitionBy($"l_partkey")))
      .where($"price" === $"mn")
      .select($"p_partkey", $"p_name", $"s_name", $"n_name",
        $"price".cast("double").as("price"))
      .distinct()
      .orderBy($"p_partkey", $"s_name")
  }

  val q144Sql: String =
    """WITH eligible AS (
      |  SELECT s_suppkey, s_name, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), offers AS (
      |  SELECT l_partkey, s_name, n_name,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      |  FROM lineitem
      |  JOIN eligible ON l_suppkey = s_suppkey
      |  JOIN part ON l_partkey = p_partkey AND p_size <= 10
      |)
      |SELECT DISTINCT p.p_partkey, p.p_name, o.s_name, o.n_name,
      |       CAST(o.price AS DOUBLE) AS price
      |FROM (SELECT *, min(price) OVER (PARTITION BY l_partkey) AS mn
      |      FROM offers) o
      |JOIN part p ON p.p_partkey = o.l_partkey
      |WHERE o.price = o.mn
      |ORDER BY p.p_partkey, o.s_name""".stripMargin

  /** q145: TPC-H Q15 shape — the top-revenue supplier of a quarter:
    * per-supplier revenue over a shipdate window, then the scalar MAX
    * joined back by exact DECIMAL equality (Q15's view + WHERE
    * total = (SELECT max…)). The revenue stays DECIMAL through
    * aggregation, max, and the equality — bit-exact on both engines —
    * and casts to DOUBLE only on output. Ties all survive, like Q15. */
  def q145TopRevenueSupplier(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, d)
      .where($"l_shipdate".between("1995-01-01", "1995-03-31"))
      .groupBy($"l_suppkey")
      .agg(sum(money($"l_extendedprice") *
        (lit(1).cast("decimal(18,2)") - money($"l_discount"))).as("total_rev"))
    rev
      .join(broadcast(rev.agg(max($"total_rev").as("mx"))), $"total_rev" === $"mx")
      .join(broadcast(Tables.supplier(spark, d)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q145Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
      |  GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM rev
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT max(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin
}
