package graft.operators

import graft.SparkSpec

/** Recall bounds for the approximate ANN paths against the exact
  * brute-force top-k, and shape invariants for the baseline. */
class SimilaritySpec extends SparkSpec {

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val brute = resultSet(Similarity.bruteForceTopK(spark, sfDirMid, 5, 10))

  test("brute-force top-k returns exactly k neighbors per query") {
    val byQuery = brute.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, ns) => assert(ns.size == 5) }
    assert(brute.forall { case (q, n) => q != n })
  }

  test("IVF ANN recall >= 0.6 vs brute force (nProbe=4/16)") {
    val ivf = resultSet(Similarity.annIvf(spark, sfDirMid, 5, 10))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("LSH ANN recall >= 0.4 vs brute force (6 planes, hamming<=2 probes)") {
    val lsh = resultSet(Similarity.annLsh(spark, sfDirMid, 5, 10))
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"LSH recall $recall")
  }

  test("IVF returns at most k neighbors per query, none equal to the query") {
    val ivf = Similarity.annIvf(spark, sfDirMid, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ivf.groupBy(_._1).foreach { case (_, ns) => assert(ns.length <= 5) }
    assert(ivf.forall { case (q, n) => q != n })
  }
}
