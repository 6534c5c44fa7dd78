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
  * Replay safety (foreachBatch is at-least-once): every write a batch
  * performs is keyed by `<runId>_<batchId>` — runId derives from the
  * checkpoint location, because the checkpoint IS Spark's run identity
  * (a fresh checkpoint restarts batch numbering at 0; a run-scoped key
  * keeps those fresh batches from colliding with an old run's markers
  * or partitions) —
  *   1. survivors → `corpusDir/ingest_batch=<key>` (Overwrite),
  *   2. index rows → `ingest_batch=b<key>` partitions (Overwrite),
  *   3. a `_committed_<key>` marker, written LAST.
  * A replayed batch with a marker is skipped outright. A replay after
  * a partial failure re-runs the dedup with the batch's OWN index
  * partition excluded from view (`excludeLabel`), so even a crash
  * between the index commit and the marker write replays to the same
  * survivor set and Overwrites the same locations — converging, never
  * losing the batch or duplicating it.
  */
object StreamingIngest {

  final case class BatchReport(batchId: Long, input: Long, kept: Long,
      contaminated: Long = 0L)

  /** Stable run identity from the checkpoint path. */
  def runIdOf(checkpointDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
  }

  /** Start the ingestion query on a streaming `docs` frame (doc_id,
    * text, …). `onBatch` observes per-batch attrition (for tests and
    * dashboards). `evalDocs` arms STREAMING DECONTAMINATION: each
    * micro-batch is screened against the benchmark set's shingles (the
    * bloom-prefiltered path; the eval shingle set is built once and
    * cached across batches) BEFORE dedup, so leaked eval documents
    * never reach the corpus or the index — the guard a pipeline
    * ingesting from the open web runs continuously, not as a one-shot
    * batch sweep. Screening is a pure function of (batch, eval set), so
    * the replay-convergence story is unchanged. Caller owns query
    * lifecycle. */
  def start(docs: DataFrame, indexDir: String, corpusDir: String,
      checkpointDir: String, threshold: Double = 0.8,
      onBatch: BatchReport => Unit = _ => (),
      evalDocs: Option[DataFrame] = None,
      minOverlap: Double = 0.5): StreamingQuery = {
    val runId = runIdOf(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, runId, indexDir, corpusDir, threshold,
          evalDocs, minOverlap)
          .foreach(onBatch)
      }
      .start()
  }

  /** One batch of the protocol above; `None` when the batch was
    * already fully committed (marker present) and was skipped. */
  def ingestBatch(batch: DataFrame, batchId: Long, runId: String,
      indexDir: String, corpusDir: String, threshold: Double,
      evalDocs: Option[DataFrame] = None,
      minOverlap: Double = 0.5,
      normalize: Boolean = false,
      intraDocSegTokens: Option[Int] = None): Option[BatchReport] = {
    val spark = batch.sparkSession
    val key = s"${runId}_$batchId"
    val marker = new Path(s"$indexDir/_committed_$key")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) None
    else {
      val label = s"b$key"
      // scan-side prepare (NFC cleanup, in-doc stutter collapse) runs
      // BEFORE any shingle key forms — both are pure projections, so
      // the micro-batch plan stays shuffle-free through this point and
      // replays deterministically.
      val prepared = graft.operators.CleanCorpus.prepare(
        batch, normalize, intraDocSegTokens)
      // decontamination FIRST: a leaked eval document must not even
      // reach the dedup index, or a later clean near-duplicate of it
      // would be dropped as "already ingested"
      // The overlap report aggregates to the CONTAMINATED doc ids — a
      // tiny frame. Materialize it once and count removed rows with a
      // broadcast-sized semi join: the old `prepared.count() −
      // survivors.count()` ran the full prepare+bloom plan per action
      // (and again when downstream dedup consumed the unpersisted
      // survivors); this computes the report exactly once per batch.
      val (screened, nContaminated, flaggedIds) = evalDocs match {
        case Some(ev) =>
          val ids = graft.operators.Decontaminate
            .overlapReportBloom(prepared, ev, minOverlap)
            .select("doc_id").persist()
          val removed = prepared.join(ids, Seq("doc_id"), "left_semi").count()
          (prepared.join(ids, Seq("doc_id"), "left_anti"), removed, Some(ids))
        case None => (prepared, 0L, None)
      }
      // commit = false: the index write happens below, AFTER the corpus
      // write; commitLabel still rides along as the exclude label so a
      // replay ignores its own partial commit.
      val (kept, stats) = DedupIndex.dedupBatch(spark, screened, indexDir,
        threshold, commit = false, commitLabel = Some(label))
      kept.write.mode(SaveMode.Overwrite)
        .parquet(s"$corpusDir/ingest_batch=$key")
      DedupIndex.writeIndexRows(kept, indexDir, label)
      fs.create(marker, true).close()
      flaggedIds.foreach(_.unpersist())
      Some(BatchReport(batchId, stats.input + nContaminated, stats.kept,
        nContaminated))
    }
  }
}
