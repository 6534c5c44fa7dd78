package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables — pre-shuffled storage for co-located joins
  * and aggregations.
  *
  * Writing both sides of a hot join bucketed on the join key with the
  * same bucket count means every future join/groupBy on that key plans
  * with NO shuffle exchange: each bucket pair is joined map-side
  * (verified in BucketingSpec by asserting the executed plan has no
  * Exchange). This is the 100 TB answer for repeatedly-joined fact
  * tables — pay the shuffle once at write time, never at read time; at
  * cluster scale the bucket count should be a multiple of the expected
  * parallelism (buckets = files per write-task batch).
  *
  * The reference's MySQL cache gets co-location implicitly from B-tree
  * indexes on (database, table); bucketing is the Spark-native
  * equivalent for the same always-filtered-and-joined key pair.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * Overwrites any existing table of the same name. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
