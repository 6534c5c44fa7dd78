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
  * Each table is laid out in `ingest_batch=<label>` partition
  * subdirectories: the base build is one partition and every committed
  * batch adds its own, written with Overwrite — so re-committing the
  * same label is IDEMPOTENT (a crashed-and-replayed commit converges
  * instead of appending duplicate index rows, which would corrupt
  * Jaccard verification counts). Readers drop the partition column.
  *
  * At 100 TB the index tables are a fraction of the corpus (hashes and
  * band keys, no text) and the per-batch cost is batch-sized: band
  * join against the stored index + Jaccard verification against the
  * stored shingles. Commit writes only the accepted batch's rows —
  * the standing index is never rewritten.
  */
object DedupIndex {

  def keysPath(dir: String) = s"$dir/keys"
  def shinglesPath(dir: String) = s"$dir/shingles"
  def bandsPath(dir: String) = s"$dir/bands"

  private def part(path: String, label: String) = s"$path/ingest_batch=$label"

  /** Build the index tables from a standing corpus (one-time
    * backfill) as the `base` partition of each table. */
  def build(corpus: DataFrame, dir: String): Unit =
    writeIndexRows(corpus, dir, label = "base")

  /** Write `docs`' derived index rows under one `ingest_batch=<label>`
    * partition of each table, Overwrite per partition — same label,
    * same docs → same files, so replays converge. */
  def writeIndexRows(docs: DataFrame, dir: String, label: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.contentKeys(docs).select($"key").distinct()
      .write.mode(SaveMode.Overwrite).parquet(part(keysPath(dir), label))
    val sh = Dedup.docShingles(docs)
    sh.write.mode(SaveMode.Overwrite).parquet(part(shinglesPath(dir), label))
    Dedup.bandedSignatures(sh)
      .write.mode(SaveMode.Overwrite).parquet(part(bandsPath(dir), label))
  }

  /** Read one index table across all committed partitions, dropping
    * the partition column so downstream unions/joins see the bare
    * schema. */
  private def readIndex(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path).select(cols.map(col): _*)

  /** Dedup `newDocs` against the stored index (exact + LSH near-dup,
    * [[Dedup.incrementalDedupFrames]] semantics). When `commit` is
    * true, the surviving batch's keys/shingles/bands are written as a
    * new index partition (labelled `commitLabel`, or a time-derived
    * label) so the next batch dedups against them too. */
  def dedupBatch(spark: SparkSession, newDocs: DataFrame, dir: String,
      threshold: Double = 0.8, commit: Boolean = true,
      commitLabel: Option[String] = None)
      : (DataFrame, Dedup.IncrementalStats) = {
    val (kept, stats) = Dedup.incrementalDedupFrames(newDocs,
      readIndex(spark, keysPath(dir), Seq("key")),
      readIndex(spark, shinglesPath(dir), Seq("doc_id", "sh")),
      readIndex(spark, bandsPath(dir), Seq("doc_id", "band", "bh")),
      threshold)
    // `kept` is already localCheckpoint'd by incrementalDedupFrames
    // (no upstream plan), so the writes below can't trigger a
    // recacheByPath re-derivation against an index that now contains
    // the batch itself, and no cached working frame outlives this call.
    if (commit) {
      val label = commitLabel.getOrElse(s"t${System.currentTimeMillis()}")
      writeIndexRows(kept, dir, label)
    }
    (kept, stats)
  }
}
