package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupIndex

/** Continuous corpus ingestion with DURABLE cross-batch dedup — the
  * streaming front door of the curation pipeline. A document stream is
  * consumed with `foreachBatch`; every micro-batch is deduped (exact +
  * LSH near-dup) against the persistent [[DedupIndex]], survivors are
  * appended to the corpus, and the batch's index rows are committed so
  * later batches — and later RUNS — dedup against them.
  *
  * This is the state story `dropDuplicatesWithinWatermark` can't tell:
  * streaming state lives in the checkpoint and is bounded by the
  * watermark horizon, but a training corpus must dedup against
  * EVERYTHING ever accepted. Here the "state" is the index tables
  * themselves — unbounded horizon, shared with the batch pipeline, and
  * queryable.
  *
  * Replay safety (foreachBatch is at-least-once): all three writes a
  * batch performs are keyed by its deterministic `batchId` —
  *   1. survivors → `corpusDir/ingest_batch=<id>` (Overwrite),
  *   2. index rows → `ingest_batch=b<id>` partitions (Overwrite),
  *   3. a `_committed_<id>` marker, written LAST.
  * A replayed batch with a marker is skipped outright; a replay after
  * a partial failure re-runs the dedup against an index that cannot
  * yet contain the batch's own rows (the marker gate is written after
  * the index commit) and overwrites the same locations — converging,
  * never duplicating.
  */
object StreamingIngest {

  final case class BatchReport(batchId: Long, input: Long, kept: Long)

  /** Start the ingestion query on a streaming `docs` frame (doc_id,
    * text, …). `onBatch` observes per-batch attrition (for tests and
    * dashboards). Caller owns query lifecycle. */
  def start(docs: DataFrame, indexDir: String, corpusDir: String,
      checkpointDir: String, threshold: Double = 0.8,
      onBatch: BatchReport => Unit = _ => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, indexDir, corpusDir, threshold)
          .foreach(onBatch)
      }
      .start()

  /** One batch of the protocol above; `None` when the batch was
    * already fully committed (marker present) and was skipped. */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String,
      corpusDir: String, threshold: Double): Option[BatchReport] = {
    val spark = batch.sparkSession
    val marker = new Path(s"$indexDir/_committed_$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) None
    else {
      val (kept, stats) = DedupIndex.dedupBatch(spark, batch, indexDir,
        threshold, commit = false)
      kept.write.mode(SaveMode.Overwrite)
        .parquet(s"$corpusDir/ingest_batch=$batchId")
      DedupIndex.writeIndexRows(kept, indexDir, label = s"b$batchId")
      fs.create(marker, true).close()
      Some(BatchReport(batchId, stats.input, stats.kept))
    }
  }
}
