package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming LM scoring must equal the batch `fluencyAgainst` over the
  * union of micro-batches, and replaying a batch must converge. */
class StreamingLmScoreSpec extends SparkSpec {

  test("availableNow scoring equals batch; partitions keyed by run+batch; replay converges") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lmscore-stream")
    val (srcDir, storeDir, scoresDir, ckpt) =
      (s"$root/src", s"$root/store", s"$root/scores", s"$root/ckpt")
    // Standing stats from a tiny corpus.
    graft.operators.CorpusStatsStore.build(
      Seq((100L, "a b a b"), (101L, "a b c")).toDF("doc_id", "text"), storeDir)
    // Two source files → two micro-batches under maxFilesPerTrigger=1.
    Seq((0L, "a b x"), (1L, "x a")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/f1")
    Seq((2L, ""), (3L, "q z")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/f2")
    val reports = scala.collection.mutable.ArrayBuffer.empty[StreamingLmScore.ScoreReport]
    val q = StreamingLmScore.start(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*"),
      storeDir, scoresDir, ckpt, r => reports.synchronized { reports += r })
    // availableNow isn't used on the writeStream side (foreachBatch +
    // file source): drain by processing all available then stop.
    q.processAllAvailable()
    q.stop()
    assert(reports.map(_.docs).sum == 4, reports.toString)
    assert(reports.forall(_.version == 1))
    val streamed = spark.read.parquet(s"$scoresDir/score_batch=*")
      .select($"doc_id", $"n_bigrams", $"score_sum", $"fluency")
      .collect().map(_.toString).sorted
    graft.util.PlanCache.clearAll()
    val batch = graft.operators.LmScore.fluencyAgainst(
      Seq((0L, "a b x"), (1L, "x a"), (2L, ""), (3L, "q z"))
        .toDF("doc_id", "text"), storeDir)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch), s"stream=${streamed.mkString(",")}")
    // Replay convergence: re-running a batch overwrites the same
    // partition with the same rows.
    val runId = StreamingIngest.runIdOf(ckpt)
    val before = spark.read.parquet(s"$scoresDir/score_batch=${runId}_0")
      .collect().map(_.toString).sorted
    StreamingLmScore.scoreBatch(
      Seq((0L, "a b x"), (1L, "x a")).toDF("doc_id", "text"),
      0L, runId, storeDir, scoresDir)
    val after = spark.read.parquet(s"$scoresDir/score_batch=${runId}_0")
      .collect().map(_.toString).sorted
    assert(before.sameElements(after))
    // A store update is visible to the NEXT batch without restart.
    graft.operators.CorpusStatsStore.update(
      Seq((200L, "z q z")).toDF("doc_id", "text"), storeDir)
    val r2 = StreamingLmScore.scoreBatch(
      Seq((9L, "x z")).toDF("doc_id", "text"), 99L, runId, storeDir, scoresDir)
    assert(r2.version == 2)
    val z = spark.read.parquet(s"$scoresDir/score_batch=${runId}_99")
      .collect().head
    // "x z": bigram unknown, but z is now a known continuation → 2/5.
    assert(z.getLong(1) == 1L && z.getLong(2) == 2L)
  }
}
