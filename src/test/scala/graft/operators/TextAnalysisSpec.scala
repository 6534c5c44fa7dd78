package graft.operators

import graft.SparkSpec

/** Invariants for the fingerprint operator (hash-seeded, no SQL oracle)
  * and sanity for the oracle-checked text analysis. */
class TextAnalysisSpec extends SparkSpec {

  test("identical texts produce identical fingerprint sets; different texts differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words occupy this sentence for the test case here now")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("fingerprint covers every document with at least one fingerprint") {
    val rows = TextAnalysis.fingerprint(spark, sfDirMid).collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getAs[Long]("n_fingerprints") >= 1))
  }

  test("quality keep flag honors token bounds") {
    val rows = TextAnalysis.qualityScore(spark, sfDirMid).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val keep = r.getAs[Boolean]("keep")
      if (n < 20 || n > 1000) assert(!keep)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
  }
}
