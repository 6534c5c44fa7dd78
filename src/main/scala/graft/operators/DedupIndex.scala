package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent dedup index — the operational form of incremental
  * dedup at corpus scale. A standing corpus's derived frames are
  * materialized ONCE as three parquet tables and updated as batches
  * commit; deduping a new batch reads the index tables, never the
  * corpus documents:
  *
  *  - `keys`     (key)               distinct full-text content hashes
  *  - `shingles` (doc_id, sh)        the word-3-gram index
  *  - `bands`    (doc_id, band, bh)  the banded MinHash-LSH keys
  *
  * At 100 TB the index tables are a fraction of the corpus (hashes and
  * band keys, no text) and the per-batch cost is batch-sized: band
  * join against the stored index + Jaccard verification against the
  * stored shingles. Commit appends only the accepted batch's rows —
  * the standing index is never rewritten.
  */
object DedupIndex {

  def keysPath(dir: String) = s"$dir/keys"
  def shinglesPath(dir: String) = s"$dir/shingles"
  def bandsPath(dir: String) = s"$dir/bands"

  /** Build the index tables from a standing corpus (one-time
    * backfill). */
  def build(corpus: DataFrame, dir: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Dedup.contentKeys(corpus).select($"key").distinct()
      .write.mode(SaveMode.Overwrite).parquet(keysPath(dir))
    val sh = Dedup.docShingles(corpus)
    sh.write.mode(SaveMode.Overwrite).parquet(shinglesPath(dir))
    Dedup.bandedSignatures(sh)
      .write.mode(SaveMode.Overwrite).parquet(bandsPath(dir))
  }

  /** Dedup `newDocs` against the stored index (exact + LSH near-dup,
    * [[Dedup.incrementalDedupFrames]] semantics). When `commit` is
    * true, the surviving batch's keys/shingles/bands are appended to
    * the index so the next batch dedups against them too. */
  def dedupBatch(spark: SparkSession, newDocs: DataFrame, dir: String,
      threshold: Double = 0.8, commit: Boolean = true)
      : (DataFrame, Dedup.IncrementalStats) = {
    import spark.implicits._
    val (kept, stats) = Dedup.incrementalDedupFrames(newDocs,
      spark.read.parquet(keysPath(dir)),
      spark.read.parquet(shinglesPath(dir)),
      spark.read.parquet(bandsPath(dir)),
      threshold)
    // `kept` is already localCheckpoint'd by incrementalDedupFrames
    // (no upstream plan), so the appends below can't trigger a
    // recacheByPath re-derivation against an index that now contains
    // the batch itself, and no cached working frame outlives this call.
    if (commit) {
      Dedup.contentKeys(kept).select($"key").distinct()
        .write.mode(SaveMode.Append).parquet(keysPath(dir))
      val shKept = Dedup.docShingles(kept)
      shKept.write.mode(SaveMode.Append).parquet(shinglesPath(dir))
      Dedup.bandedSignatures(shKept)
        .write.mode(SaveMode.Append).parquet(bandsPath(dir))
    }
    (kept, stats)
  }
}
