package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  test("assignments are argmax-optimal against the trained centroids") {
    import spark.implicits._
    val k = 4
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
      .as[(Long, Array[Double])]
    val cents = Similarity.kmeansCentroids(e, k, 3).toMap
    val vecs = e.collect().toMap
    val got = Clustering.assign(spark, sfDir, k, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(got.length == vecs.size)
    got.foreach { case (id, (cid, cos)) =>
      val v = vecs(id)
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val best = cents.map { case (c, cv) => (dot(v, cv), c) }
        .maxBy { case (s, c) => (s, -c) } // ties → smallest cluster_id
      assert(cid == best._2, s"vec $id")
      assert(math.abs(cos - best._1) < 1e-9)
    }
  }

  test("q73 summary is deterministic and partitions the corpus") {
    val out = Clustering.q73KmeansClusters(spark, sfDir).collect()
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n)
    // schema: cluster_id, n_vecs, rep_vec_id, top_label, top_label_n
    out.foreach { r =>
      assert(r.getLong(4) >= 1L && r.getLong(4) <= r.getLong(1))
    }
    val again = Clustering.q73KmeansClusters(spark, sfDir).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }
}
