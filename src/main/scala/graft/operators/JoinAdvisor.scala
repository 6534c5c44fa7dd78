package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Join strategy advisor — the planning-family mirror of the rewrite
  * advisory (q142), aimed at joins instead of files: before a 100 TB
  * fact table joins a dimension, profile the join key on BOTH sides
  * and recommend the physical strategy a human would pick —
  *
  *   - `broadcast_dim`  the dimension fits a broadcast threshold;
  *   - `salt_fact`      the hottest fact key owns more than a skew
  *                      share of rows — a plain hash shuffle would put
  *                      that key's whole partition on one task;
  *   - `hash_shuffle`   neither condition: the default co-partition.
  *
  * Decisions are EXACT-INTEGER (cross-multiplied shares, no division),
  * so the DuckDB oracle replays them bit-for-bit. One aggregation per
  * candidate key (partial max/count per partition, key-cardinality
  * shuffle), one count per dimension — the profile costs a scan, which
  * is the point: you spend one scan to avoid re-running a skewed 100 TB
  * shuffle twice.
  */
object JoinAdvisor {

  /** Profile one fact-side join key against its dimension: exact
    * per-key histogram stats on the fact side, row count on the dim
    * side, and the strategy pick. `skewPct` is the per-key share (in
    * percent) above which the hottest key forces salting. */
  def adviseJoin(fact: DataFrame, key: Column, keyName: String,
      dim: DataFrame, dimName: String,
      broadcastRowLimit: Long, skewPct: Int): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    val keyCounts = fact.select(key.as("k")).groupBy($"k").agg(count(lit(1)).as("n"))
    val stats = keyCounts.agg(
      sum($"n").as("fact_rows"),
      count(lit(1)).as("n_keys"),
      max($"n").as("max_key_rows"))
    val dimRows = dim.select(count(lit(1)).as("dim_rows"))
    stats.crossJoin(dimRows)
      .withColumn("join_key", lit(keyName))
      .withColumn("dim_table", lit(dimName))
      // skew test without division: max_key_rows / fact_rows > pct/100
      .withColumn("skewed", $"max_key_rows" * 100 > $"fact_rows" * skewPct)
      .withColumn("strategy",
        when($"dim_rows" <= broadcastRowLimit, lit("broadcast_dim"))
          .when($"skewed", lit("salt_fact"))
          .otherwise(lit("hash_shuffle")))
      .select($"join_key", $"dim_table", $"fact_rows", $"n_keys",
        $"max_key_rows", $"dim_rows", $"skewed", $"strategy")
  }

  /** q146: advise the three lineitem join axes. Thresholds are chosen
    * so all strategies can surface on the test corpus: orders is above
    * the broadcast limit (→ skew test decides), part/supplier fit it.
    */
  def q146JoinAdvisor(spark: SparkSession, d: String,
      broadcastRowLimit: Long = 5000, skewPct: Int = 1): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, d)
    adviseJoin(l, $"l_orderkey", "l_orderkey",
        Tables.orders(spark, d), "orders", broadcastRowLimit, skewPct)
      .unionAll(adviseJoin(l, $"l_partkey", "l_partkey",
        Tables.part(spark, d), "part", broadcastRowLimit, skewPct))
      .unionAll(adviseJoin(l, $"l_suppkey", "l_suppkey",
        Tables.supplier(spark, d), "supplier", broadcastRowLimit, skewPct))
      .orderBy($"join_key")
  }

  def q146Sql(broadcastRowLimit: Long = 5000, skewPct: Int = 1): String = {
    def block(key: String, dim: String) =
      s"""SELECT '$key' AS join_key, '$dim' AS dim_table,
         |       s.fact_rows, s.n_keys, s.max_key_rows, d.dim_rows,
         |       s.max_key_rows * 100 > s.fact_rows * $skewPct AS skewed,
         |       CASE WHEN d.dim_rows <= $broadcastRowLimit THEN 'broadcast_dim'
         |            WHEN s.max_key_rows * 100 > s.fact_rows * $skewPct THEN 'salt_fact'
         |            ELSE 'hash_shuffle' END AS strategy
         |FROM (SELECT CAST(sum(n) AS BIGINT) AS fact_rows,
         |             count(*) AS n_keys, max(n) AS max_key_rows
         |      FROM (SELECT $key AS k, count(*) AS n FROM lineitem GROUP BY 1)) s
         |CROSS JOIN (SELECT count(*) AS dim_rows FROM $dim) d""".stripMargin
    s"""${block("l_orderkey", "orders")}
       |UNION ALL
       |${block("l_partkey", "part")}
       |UNION ALL
       |${block("l_suppkey", "supplier")}
       |ORDER BY join_key""".stripMargin
  }
}
