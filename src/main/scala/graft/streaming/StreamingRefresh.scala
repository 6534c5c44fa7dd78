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
    // the aggregate below keys on event_type only — no ts conversion
    // needed (and the old double-division form had the 53-bit-mantissa
    // precision bug Tables.events documents)
    val stream = spark.readStream.schema(schema).parquet(sourceDir)

    val q = stream
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("total"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark2 = batch.sparkSession
        val hconf = spark2.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(statePath)
        val fs = target.getFileSystem(hconf)
        val incoming = batch.select("event_type", "n", "total")
        val existing =
          if (fs.exists(target)) spark2.read.parquet(statePath)
          else incoming.limit(0)
        // merge: sum overlapping keys (complete mode replays the whole
        // aggregate, so "merge" here is replace-by-key + keep-others).
        val merged = existing.join(incoming, Seq("event_type"), "left_anti")
          .unionByName(incoming)
        // crash-durable rename swap (same shape as MetaStore.rewrite):
        // write tmp distributed, move the old state aside, promote tmp —
        // never a delete-then-rewrite window, no leaked tmp dirs.
        val tmp = new org.apache.hadoop.fs.Path(statePath + "__tmp")
        val old = new org.apache.hadoop.fs.Path(statePath + "__old")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(target) && !fs.rename(target, old))
          throw new java.io.IOException(s"could not move $target aside")
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"could not promote $tmp to $target")
        fs.delete(old, true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(statePath)
  }
}
