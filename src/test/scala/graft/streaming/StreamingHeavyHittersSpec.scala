package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.HeavyHitters
import graft.sources.Tables

/** Streaming Misra–Gries: multi-batch state folding must equal one
  * pass, and at exactness capacity the standing sketch IS the exact
  * count table. */
class StreamingHeavyHittersSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("shh").toString

  test("mgUpdate split-fold equals one-pass fold (with eviction in play)") {
    val items = Seq.fill(40)("hot") ++ (1 to 25).map(i => s"t$i") ++ Seq.fill(10)("hot")
    val (a, b) = items.splitAt(23)
    val once = mutable.Map.empty[String, Long]
    HeavyHitters.mgUpdate(once, items.iterator, 4)
    val twice = mutable.Map.empty[String, Long]
    HeavyHitters.mgUpdate(twice, a.iterator, 4)
    HeavyHitters.mgUpdate(twice, b.iterator, 4)
    assert(twice == once)
    assert(once.contains("hot")) // the guaranteed survivor
  }

  test("streaming sketch over two micro-batches equals exact counts at exactness capacity") {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
      .where($"token" =!= "")
    val exact = toks.groupBy($"token").count()
      .as[(String, Long)].collect().toMap

    // two source files → two micro-batches under maxFilesPerTrigger=1
    val srcDir = tmp()
    val arr = toks.as[String].collect()
    val (h1, h2) = arr.splitAt(arr.length / 2)
    h1.toSeq.toDF("token").coalesce(1).write.parquet(s"$srcDir/f=1")
    h2.toSeq.toDF("token").coalesce(1).write.parquet(s"$srcDir/f=2")

    val stream = spark.readStream
      .schema("token STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/f=*")
      .as[String]
    val q = StreamingHeavyHitters.sketchStream(stream, nShards = 8, capacity = 64)
      .writeStream.format("memory").queryName("shh_out")
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val rows = spark.table("shh_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // final state per shard = rows from that shard's last emit
    val lastSeen = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val finalCounts = rows
      .filter { case (s, _, _, seen) => seen == lastSeen(s) }
      .map { case (_, t, c, _) => t -> c }.toMap
    assert(finalCounts == exact,
      s"diff=${(finalCounts.toSet diff exact.toSet).take(5)}")
    assert(rows.map(_._4).distinct.length >= 2, "expected at least two emits (two batches)")
  }
}
