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
}
