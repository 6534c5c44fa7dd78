package graft.streaming

import graft.SparkSpec

class StreamingRefreshSpec extends SparkSpec {

  test("foreachBatch refresh materializes per-type counters equal to batch") {
    import org.apache.spark.sql.functions._
    val srcDir = {
      val d = java.nio.file.Files.createTempDirectory("sr-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        d.resolve("events.parquet"))
      d.toString
    }
    val statePath = java.nio.file.Files.createTempDirectory("sr-state").toString + "/state"
    val ckpt = java.nio.file.Files.createTempDirectory("sr-ckpt").toString

    val state = StreamingRefresh.refreshEventStats(spark, srcDir, statePath, ckpt)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap

    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap

    assert(state == batch)
  }
}
