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

  /** Salted inner equi-join: the skewed (large) side gets a random salt
    * in [0, salt); the small side is replicated `salt` times; the join
    * key becomes (key, salt) so one hot key spreads over `salt` tasks.
    * Results are identical to `large.join(small, key)` — verified in
    * DistributionSpec. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val spark = large.sparkSession
    import spark.implicits._
    val salted = large.withColumn("__salt", pmod(xxhash64(rand(seed = 42)), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed by the join key so the join is
    * co-located: no Exchange on either side of the SortMergeJoin —
    * verified against the physical plan in DistributionSpec. Bucketed
    * tables need the session catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", bucketPath(df.sparkSession, table))
      .saveAsTable(table)

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
