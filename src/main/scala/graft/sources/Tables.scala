package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TESTDATA parquet tables.
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * single-file parquet tables inside. Reads are plain `spark.read.parquet`
  * so Catalyst's parquet source handles column pruning + filter pushdown;
  * at 100 TB these would be partitioned/ bucketed external tables, but the
  * query code is identical — only the path/catalog binding changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy flag) and convert to a
    * microsecond timestamp — truncation toward negative infinity matches
    * DuckDB's ns→µs handling for the epochs in play. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `div` is integral long division: `floor(ts / 1000)` would route
    // through a double, whose 53-bit mantissa can't hold an epoch-ns
    // value (~1.7e18) — timestamps came out up to ~256 ns off, visible
    // the moment a query emits raw microsecond values.
    load(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
