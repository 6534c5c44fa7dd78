package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming metadata refresh: a continuously-updating slice of the
  * metadata cache maintained by a foreachBatch merge — the streaming
  * counterpart of the reference's hourly cron refresh (M5). Each
  * micro-batch folds new per-key aggregates into the persisted state
  * table (read-merge-overwrite per batch; at scale the sink would be a
  * MERGE INTO on a transactional table — the batch logic is
  * identical).
  */
object StreamingRefresh {

  /** Run an availableNow streaming refresh of per-event_type counters
    * from `sourceDir` into `statePath`, merging with any existing
    * state. Returns the final state. */
  def refreshEventStats(spark: SparkSession, sourceDir: String, statePath: String,
      checkpoint: String): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))

    val q = stream
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark2 = batch.sparkSession
        val incoming = batch.select("event_type", "n", "total")
        val existing =
          if (new java.io.File(statePath).exists())
            spark2.read.parquet(statePath)
          else incoming.limit(0)
        // merge: sum overlapping keys (complete mode replays the whole
        // aggregate, so "merge" here is replace-by-key + keep-others).
        val merged = existing.join(incoming, Seq("event_type"), "left_anti")
          .unionByName(incoming)
        val tmp = statePath + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        spark2.read.parquet(tmp).write.mode("overwrite").parquet(statePath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(statePath)
  }
}
