package graft.operators

import graft.SparkSpec

/** Source-priority dedup keeper selection and the corpus-mix report. */
class SourceGovernanceSpec extends SparkSpec {

  test("priority keeper picks the most-curated source, then lowest id") {
    import spark.implicits._
    // same 5-token prefix → one duplicate group; src2 outranks src10
    // (numeric rank, not lexicographic — "src10" < "src2" as strings)
    val dir = java.nio.file.Files.createTempDirectory("prio").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon one", "en", "src10", 30L),
      (2L, "alpha beta gamma delta epsilon two", "en", "src2", 30L),
      (3L, "alpha beta gamma delta epsilon three", "en", "src2", 30L),
      (4L, "totally different text entirely here now", "en", "src0", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.exactPriority(spark, dir).collect()
    assert(rows.length == 1) // doc 4 is unique → not a group
    val r = rows.head
    assert(r.getAs[Long]("n_docs") == 3L)
    // src2 (prio 2) beats src10 (prio 10) despite doc 1 having the
    // lowest id; within src2, doc 2 < doc 3
    assert(r.getAs[Long]("keeper") == 2L)
    assert(r.getAs[Long]("n_sources") == 2L)
  }

  test("priority keeper equals plain keeper when every group is single-source") {
    import spark.implicits._
    val both = Dedup.exactPriority(spark, sfDir)
      .select($"key", $"n_docs").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = Dedup.exact(spark, sfDir)
      .select($"key", $"n_docs").collect().map(r => (r.getString(0), r.getLong(1)))
    // group structure is identical — only keeper choice differs
    assert(both.toSeq == plain.toSeq)
  }

  test("source mix shares are exact and sum to 1") {
    val rows = Sampling.q93SourceMix(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      assert(r.getAs[Double]("share") == r.getAs[Long]("n_docs").toDouble / total)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    assert(rows.map(_.getAs[Long]("n_langs")).forall(n => n >= 1 && n <= 5))
  }
}
