package graft.operators

import graft.SparkSpec

/** Bloom-prefiltered decontamination must be bit-identical to the exact
  * path (no false negatives in the filter; false positives are removed
  * by the exact verify join). */
class DecontaminateSpec extends SparkSpec {

  test("bloom-prefiltered overlap report equals the exact report") {
    import spark.implicits._
    val all = graft.sources.Tables.documents(spark, sfDir)
    val corpus = all.where($"doc_id" >= 50)
    val eval = all.where($"doc_id" < 50)
    val exact = Decontaminate.overlapReport(corpus, eval, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Decontaminate.overlapReportBloom(corpus, eval, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact && exact.nonEmpty)
  }

  test("contamination pairs equal a brute-force shared-shingle count") {
    import spark.implicits._
    val all = graft.sources.Tables.documents(spark, sfDir)
    val corpus = all.where($"doc_id" >= 50)
    val eval = all.where($"doc_id" < 50)
    val got = Decontaminate.contaminationPairs(corpus, eval, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    def shingles(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      df.select($"doc_id", $"text").collect()
        .filter(!_.isNullAt(1))
        .map { r =>
          r.getLong(0) -> r.getString(1).toLowerCase.split(' ')
            .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        }.toMap
    val c = shingles(corpus); val e = shingles(eval)
    val brute = (for {
      (cid, cs) <- c; (eid, es) <- e
      n = (cs & es).size.toLong if n >= 5
    } yield (cid, eid) -> n).toMap
    assert(got == brute && got.nonEmpty)
  }

  test("contamination pairs with an empty eval side is empty, not a crash") {
    import spark.implicits._
    val all = graft.sources.Tables.documents(spark, sfDir)
    val none = all.where($"doc_id" < -1)
    assert(Decontaminate.contaminationPairs(all, none, 1L).isEmpty)
  }

  test("a very lossy filter (high fpp) still yields the exact report") {
    import spark.implicits._
    val all = graft.sources.Tables.documents(spark, sfDir)
    val corpus = all.where($"doc_id" >= 50)
    val eval = all.where($"doc_id" < 50)
    val exact = Decontaminate.overlapReport(corpus, eval, 0.5)
      .collect().map(_.getLong(0)).toSet
    val lossy = Decontaminate.overlapReportBloom(corpus, eval, 0.5, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(lossy == exact)
  }

  test("auto path picks by eval size and matches the exact report either way") {
    import spark.implicits._
    val all = graft.sources.Tables.documents(spark, sfDir)
    val corpus = all.where($"doc_id" >= 50)
    val eval = all.where($"doc_id" < 50)
    val exact = Decontaminate.overlapReport(corpus, eval, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // tiny eval set → exact path; threshold 0 → bloom path; same rows
    val autoExact = Decontaminate.overlapReportAuto(corpus, eval, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val autoBloom = Decontaminate.overlapReportAuto(corpus, eval, 0.5,
        bloomMinEvalShingles = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(autoExact == exact)
    assert(autoBloom == exact)
  }
}
