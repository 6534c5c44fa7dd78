package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-distribution tools for the 100 TB posture: key-salting for
  * skewed joins and bucketed tables for shuffle-free co-located joins
  * (builder brief: "broadcast small dims, repartition/bucketing for
  * co-located joins, salting for skew").
  *
  * AQE's skew-join splitting handles most skew at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split shuffle blocks overwhelm a task, or when AQE is unavailable
  * (e.g. inside a cached exchange).
  */
object Distribution {

  /** Salted equi-join: every row of the skewed (large) side gets a
    * salt in [0, salt) — a hash of the row content mixed with a
    * per-row sequence number, so even fully-duplicated hot-key rows
    * spread over the salt range (content alone would send identical
    * rows to one task; which salt a row gets never affects the result,
    * only the distribution). The small side is replicated `salt`
    * times; the join key becomes (key, salt) so one hot key spreads
    * over `salt` tasks.
    *
    * Only inner and left-outer types are accepted: a right/full outer
    * join would emit every unmatched small-side row once per replica.
    * Results are identical to `large.join(small, key, joinType)` —
    * verified in DistributionSpec (inner and left_outer). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(Set("inner", "left", "leftouter")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left_outer joins, not $joinType " +
        "(outer small-side rows would duplicate per replica)")
    val saltCol = pmod(
      xxhash64((large.columns.map(col) :+ monotonically_increasing_id()).toSeq: _*),
      lit(salt))
    val salted = large.withColumn("__salt", saltCol)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed by the join key so the join is
    * co-located: no Exchange on either side of the SortMergeJoin —
    * verified against the physical plan in DistributionSpec. Bucketed
    * tables need the session catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key variant — e.g. metadata tables bucketed by
    * (database, table), the reference's always-joined index pair. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", bucketPath(df.sparkSession, table))
      .saveAsTable(table)
  }

  private def bucketPath(spark: SparkSession, table: String): String = {
    val base = spark.conf.get("spark.sql.warehouse.dir")
    s"$base/bucketed/$table"
  }

  /** Two-phase distinct count for skew-prone keys: phase 1 dedups on
    * (key, value) — the shuffle spreads a hot key across value hashes —
    * phase 2 counts per key. `groupBy(key).agg(countDistinct)` instead
    * shuffles every occurrence of the hot key to one task. Result
    * equality verified in DistributionSpec. */
  def twoPhaseDistinctCount(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key)).agg(count(lit(1)).as("n_distinct"))

  /** True when the physical plan of `df` contains a shuffle exchange.
    * Inspects the explain string — under AQE the exchanges live inside
    * AdaptiveSparkPlanExec, invisible to a top-level node traversal. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      .contains("Exchange hashpartitioning")
}
