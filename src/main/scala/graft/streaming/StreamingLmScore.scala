package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous LM-quality scoring of a document stream against the
  * STANDING [[graft.operators.CorpusStatsStore]] — the streaming twin
  * of `LmScore.fluencyAgainst`. Each micro-batch joins the store's
  * vocabulary-sized bigram table; the corpus behind the statistics is
  * never re-scanned, and because the store is re-read per batch, a
  * `CorpusStatsStore.update` lands at the next batch boundary without
  * restarting the query — scoring and statistics maintenance are
  * decoupled jobs, exactly the production posture.
  *
  * Replay safety: foreachBatch is at-least-once, so each batch's scores
  * Overwrite a `score_batch=<runId>_<batchId>` partition — a replayed
  * batch recomputes the same deterministic frame into the same
  * location (the StreamingIngest convention; no marker needed because
  * scoring writes exactly one idempotent output).
  */
object StreamingLmScore {

  final case class ScoreReport(batchId: Long, docs: Long, version: Int)

  def start(docs: DataFrame, storeDir: String, scoresDir: String,
      checkpointDir: String,
      onBatch: ScoreReport => Unit = _ => ()): StreamingQuery = {
    val runId = StreamingIngest.runIdOf(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(scoreBatch(batch.toDF(), batchId, runId, storeDir, scoresDir))
      }
      .start()
  }

  /** One batch: resolve the store version ONCE, score pinned to it
    * (a concurrent `CorpusStatsStore.update` landing mid-batch cannot
    * make the report's `version` mislabel the statistics that actually
    * scored the batch — versions are immutable), Overwrite the batch
    * partition, and count from the scored frame itself (persisted
    * across the write) rather than re-reading the parquet. */
  def scoreBatch(batch: DataFrame, batchId: Long, runId: String,
      storeDir: String, scoresDir: String): ScoreReport = {
    val v = graft.operators.CorpusStatsStore.latestVersion(batch.sparkSession, storeDir)
      .getOrElse(throw new IllegalStateException(
        s"no corpus stats at $storeDir — build first"))
    val scored =
      graft.operators.LmScore.fluencyAgainstPinned(batch, storeDir, v).persist()
    try {
      val n = scored.count()
      scored.write.mode(SaveMode.Overwrite)
        .parquet(s"$scoresDir/score_batch=${runId}_$batchId")
      ScoreReport(batchId, n, v)
    } finally scored.unpersist()
  }
}
