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
    * same docs → same files, so replays converge. Refuses an index in
    * the legacy flat layout (part files at the table root): mixing the
    * two breaks Spark partition discovery for every later read, so the
    * failure must happen HERE, with a migration hint, not downstream. */
  def writeIndexRows(docs: DataFrame, dir: String, label: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    requirePartitionedLayout(spark, keysPath(dir))
    Dedup.contentKeys(docs).select($"key").distinct()
      .write.mode(SaveMode.Overwrite).parquet(part(keysPath(dir), label))
    val sh = Dedup.docShingles(docs)
    sh.write.mode(SaveMode.Overwrite).parquet(part(shinglesPath(dir), label))
    Dedup.bandedSignatures(sh)
      .write.mode(SaveMode.Overwrite).parquet(part(bandsPath(dir), label))
  }

  private def requirePartitionedLayout(spark: SparkSession, tablePath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val flat = fs.listStatus(p).exists(s =>
        s.isFile && s.getPath.getName.startsWith("part-"))
      if (flat) throw new IllegalStateException(
        s"$tablePath uses the legacy flat index layout; rebuild the index " +
          "with DedupIndex.build (index-build) before committing batches")
    }
  }

  /** Read one index table across all committed partitions, dropping
    * the partition column so downstream unions/joins see the bare
    * schema. `excludeLabel` removes one partition from view — a replayed
    * batch must not dedup against its own partially-committed rows. */
  private def readIndex(spark: SparkSession, path: String, cols: Seq[String],
      excludeLabel: Option[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val visible = excludeLabel match {
      case Some(l) if df.columns.contains("ingest_batch") =>
        df.where(col("ingest_batch") =!= l)
      case _ => df
    }
    visible.select(cols.map(col): _*)
  }

  /** Dedup `newDocs` against the stored index (exact + LSH near-dup,
    * [[Dedup.incrementalDedupFrames]] semantics). When `commit` is
    * true, the surviving batch's keys/shingles/bands are written as a
    * new index partition (labelled `commitLabel`, or a unique generated
    * label) so the next batch dedups against them too. Callers that
    * replay with a fixed label (StreamingIngest) pass it as
    * `excludeLabel` too, so a crash-rerun never dedups the batch
    * against its own earlier partial commit. */
  def dedupBatch(spark: SparkSession, newDocs: DataFrame, dir: String,
      threshold: Double = 0.8, commit: Boolean = true,
      commitLabel: Option[String] = None)
      : (DataFrame, Dedup.IncrementalStats) = {
    val (kept, stats) = Dedup.incrementalDedupFrames(newDocs,
      readIndex(spark, keysPath(dir), Seq("key"), commitLabel),
      readIndex(spark, shinglesPath(dir), Seq("doc_id", "sh"), commitLabel),
      readIndex(spark, bandsPath(dir), Seq("doc_id", "band", "bh"), commitLabel),
      threshold)
    // `kept` is already localCheckpoint'd by incrementalDedupFrames
    // (no upstream plan), so the writes below can't trigger a
    // recacheByPath re-derivation against an index that now contains
    // the batch itself, and no cached working frame outlives this call.
    if (commit) {
      // time + random suffix: two same-millisecond commits (or a clock
      // step back) must not share a label — per-partition Overwrite
      // would silently erase the earlier batch's index rows
      val label = commitLabel.getOrElse(
        s"t${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}")
      writeIndexRows(kept, dir, label)
    }
    (kept, stats)
  }
}
