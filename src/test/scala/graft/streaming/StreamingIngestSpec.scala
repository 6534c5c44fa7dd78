package graft.streaming

import graft.SparkSpec
import graft.operators.DedupIndex

/** Streaming corpus ingestion: cross-batch dedup against the durable
  * index, replay idempotency via the run-scoped batch marker — including
  * the crash window AFTER the index commit — and the end-to-end
  * streaming query over a file source. */
class StreamingIngestSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over a lazy dog and then runs far away " +
    "to find more interesting words for this synthetic document corpus today"
  private val novel = "fresh unique subject matter nobody wrote before with many extra " +
    "novel words appended here so shingles exist for this document too"

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def corpusIds(corpusDir: String): Set[Long] = {
    import spark.implicits._
    spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
  }

  test("batches dedup against the base index AND earlier batches; replays are skipped") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest-corpus").toString
    DedupIndex.build(df(Seq(1L -> base)), dir)

    // batch 0: a near-dup of the standing corpus + one novel doc
    val r0 = StreamingIngest.ingestBatch(
      df(Seq(10L -> (base + " extra"), 11L -> novel)),
      0L, "run1", dir, corpusDir, threshold = 0.5)
    assert(r0.contains(StreamingIngest.BatchReport(0L, 2L, 1L)))
    assert(corpusIds(corpusDir) == Set(11L))

    // batch 1: duplicates batch 0's accepted doc → dropped via the
    // committed index
    val r1 = StreamingIngest.ingestBatch(
      df(Seq(20L -> (novel + " ok"))),
      1L, "run1", dir, corpusDir, threshold = 0.5)
    assert(r1.contains(StreamingIngest.BatchReport(1L, 1L, 0L)))
    assert(corpusIds(corpusDir) == Set(11L))

    // replay of batch 0 (at-least-once delivery): marker gates it out,
    // corpus unchanged
    val r0again = StreamingIngest.ingestBatch(
      df(Seq(10L -> (base + " extra"), 11L -> novel)),
      0L, "run1", dir, corpusDir, threshold = 0.5)
    assert(r0again.isEmpty)
    assert(corpusIds(corpusDir) == Set(11L))
  }

  test("crash between index commit and marker: replay converges, no data loss") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx3").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest-corpus3").toString
    DedupIndex.build(df(Seq(1L -> base)), dir)
    val batch = df(Seq(11L -> novel))
    val r0 = StreamingIngest.ingestBatch(batch, 0L, "runX", dir, corpusDir, 0.5)
    assert(r0.contains(StreamingIngest.BatchReport(0L, 1L, 1L)))
    // simulate the crash window: the index partition and corpus write
    // happened, the marker did not
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_committed_runX_0"), false))
    // replay must NOT dedup the batch against its own committed index
    // rows (which would Overwrite the corpus partition with nothing)
    val replay = StreamingIngest.ingestBatch(batch, 0L, "runX", dir, corpusDir, 0.5)
    assert(replay.contains(StreamingIngest.BatchReport(0L, 1L, 1L)))
    assert(corpusIds(corpusDir) == Set(11L))
    // and a different run id is NOT gated by this run's markers
    val otherRun = StreamingIngest.ingestBatch(
      df(Seq(30L -> ("totally different themes entirely about gardens rivers " +
        "mountains and long walks through quiet forests before dawn breaks"))),
      0L, "runY", dir, corpusDir, 0.5)
    assert(otherRun.contains(StreamingIngest.BatchReport(0L, 1L, 1L)))
    assert(corpusIds(corpusDir) == Set(11L, 30L))
  }

  test("end-to-end streaming query ingests a file-source corpus once") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx2").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest-corpus2").toString
    val srcDir = java.nio.file.Files.createTempDirectory("ingest-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-ckpt").toString
    DedupIndex.build(df(Seq(1L -> base)), dir)
    // stream input: an exact dup of the corpus, a novel doc, and an
    // in-batch near-dup of that novel doc
    df(Seq(100L -> base, 101L -> novel, 102L -> (novel + " tail")))
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(srcDir)
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[StreamingIngest.BatchReport]()
    val q = StreamingIngest.start(stream, dir, corpusDir, ckpt,
      threshold = 0.5, onBatch = r => reports.add(r))
    try {
      q.processAllAvailable()
    } finally q.stop()
    assert(corpusIds(corpusDir) == Set(101L))
    import scala.jdk.CollectionConverters._
    assert(reports.asScala.map(_.input).sum == 3L)
    assert(reports.asScala.map(_.kept).sum == 1L)
  }

  test("streaming decontamination drops leaked eval docs before the index sees them") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx4").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest-corpus4").toString
    DedupIndex.build(df(Seq(1L -> base)), dir)
    val evalSet = df(Seq(900L -> novel)) // the benchmark set
    // batch 0: a leaked eval doc (near-verbatim) + a clean doc
    val clean = "completely separate prose with plenty of original tokens " +
      "covering topics the benchmark never mentions in any sentence at all"
    val r0 = StreamingIngest.ingestBatch(
      df(Seq(10L -> (novel + " tail"), 11L -> clean)),
      0L, "runD", dir, corpusDir, threshold = 0.5,
      evalDocs = Some(evalSet), minOverlap = 0.5)
    assert(r0.contains(StreamingIngest.BatchReport(0L, 2L, 1L, contaminated = 1L)))
    assert(corpusIds(corpusDir) == Set(11L))
    // batch 1: a clean near-dup of the LEAKED doc must still be
    // contaminated-dropped (not index-deduped — the leak never entered
    // the index), and a dup of the clean doc dedups normally
    val r1 = StreamingIngest.ingestBatch(
      df(Seq(20L -> (novel + " other tail"), 21L -> (clean + " x"))),
      1L, "runD", dir, corpusDir, threshold = 0.5,
      evalDocs = Some(evalSet), minOverlap = 0.5)
    assert(r1.contains(StreamingIngest.BatchReport(1L, 2L, 0L, contaminated = 1L)))
    assert(corpusIds(corpusDir) == Set(11L))
  }

  test("prepare stages run in the micro-batch: NFC variants and stutter dedup against the index") {
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx5").toString
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest-corpus5").toString
    // standing corpus: one plain doc and one where EVERY word carries a
    // composed accent — an NFD byte-variant shares zero shingles with it
    // unless the ingest normalizes first
    val accented = "café résumé naïve entrée cliché touché fiancée protégé " +
      "déjà señor niño piñata jalapeño crème brûlée soirée matinée purée sauté"
    DedupIndex.build(df(Seq(1L -> base, 2L -> accented)), dir)
    val decomposed = java.text.Normalizer.normalize(
      accented, java.text.Normalizer.Form.NFD)
    assert(decomposed != accented)
    val r0 = StreamingIngest.ingestBatch(
      df(Seq(30L -> (decomposed + " tiny tail"))),
      0L, "runP", dir, corpusDir, threshold = 0.5,
      normalize = true, intraDocSegTokens = Some(2))
    // normalized → near-dup of standing doc 2 → dropped
    assert(r0.contains(StreamingIngest.BatchReport(0L, 1L, 0L)))
    // a stutter doc: without the in-doc collapse its 80 extra repeated
    // tokens push jaccard vs the standing doc below threshold
    val stutter = base + " " + Array.fill(40)(
      base.split(' ').take(2).mkString(" ")).mkString(" ")
    val r1 = StreamingIngest.ingestBatch(
      df(Seq(31L -> stutter)), 1L, "runP", dir, corpusDir, threshold = 0.5,
      normalize = true, intraDocSegTokens = Some(2))
    assert(r1.contains(StreamingIngest.BatchReport(1L, 1L, 0L)))
  }
}
