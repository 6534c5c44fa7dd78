package graft.operators

import graft.SparkSpec

/** The persistent dedup index: batch dedup against stored tables
  * equals dedup against the in-memory corpus, and committed batches
  * extend the index for subsequent batches. */
class DedupIndexSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over a lazy dog and then runs far away " +
    "to find more interesting words for this synthetic document corpus today"
  private val other = "completely different content about databases engines queries plans " +
    "optimizers shuffles partitions executors drivers caching storage formats"

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("stored-index dedup equals in-memory incremental dedup") {
    val dir = java.nio.file.Files.createTempDirectory("dedup-index").toString
    val corpus = df(Seq(1L -> base, 2L -> other))
    val batch = df(Seq(
      10L -> (base + " extra"), // near-dup of corpus 1
      11L -> other.toUpperCase, // exact dup of corpus 2
      12L -> ("fresh unique subject matter nobody wrote before with many extra " +
        "novel words appended here so shingles exist for this document too")))
    DedupIndex.build(corpus, dir)
    val (keptMem, statsMem) = Dedup.incrementalDedup(batch, corpus, threshold = 0.5)
    val (keptIdx, statsIdx) = DedupIndex.dedupBatch(spark, batch, dir,
      threshold = 0.5, commit = false)
    val memIds = keptMem.select("doc_id").collect().map(_.getLong(0)).toSet
    val idxIds = keptIdx.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == memIds)
    assert(statsIdx == statsMem)
    assert(idxIds == Set(12L))
  }

  test("committing into a legacy flat-layout index fails with a migration hint") {
    val dir = java.nio.file.Files.createTempDirectory("dedup-index-legacy").toString
    // simulate the pre-partitioned layout: part files at the table root
    df(Seq(1L -> base)).write.parquet(DedupIndex.keysPath(dir))
    val e = intercept[IllegalStateException] {
      DedupIndex.writeIndexRows(df(Seq(2L -> other)), dir, "b0")
    }
    assert(e.getMessage.contains("legacy flat index layout"))
  }

  test("committed batches extend the index for the next batch") {
    val dir = java.nio.file.Files.createTempDirectory("dedup-index2").toString
    DedupIndex.build(df(Seq(1L -> base)), dir)
    val novel = "fresh unique subject matter nobody wrote before with many extra " +
      "novel words appended here so shingles exist for this document too"
    // batch 1: one novel doc, committed
    val (kept1, _) = DedupIndex.dedupBatch(spark, df(Seq(10L -> novel)), dir,
      threshold = 0.5, commit = true)
    assert(kept1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L))
    // batch 2: near-dup of the committed batch-1 doc AND an exact copy
    val (kept2, stats2) = DedupIndex.dedupBatch(spark,
      df(Seq(20L -> (novel + " ok"), 21L -> novel)), dir,
      threshold = 0.5, commit = true)
    assert(kept2.isEmpty, "both batch-2 docs duplicate the committed batch-1 doc")
    assert(stats2.afterExact == 1) // 21 dropped by the exact stage
    // batch 3: the same novel doc again — still caught by the appended keys
    val (kept3, _) = DedupIndex.dedupBatch(spark, df(Seq(30L -> novel)), dir,
      threshold = 0.5, commit = false)
    assert(kept3.isEmpty)
  }
}
