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

  test("q148 semantic dedup: exactly one keeper per group, groups honor clusters and tau") {
    import spark.implicits._
    val tau = 0.4
    val out = Clustering.q148SemanticDedup(spark, sfDirMid, tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val n = graft.sources.Tables.embeddings(spark, sfDirMid).count()
    assert(out.length == n, "every vector gets a fate")
    // Exactly one kept per group; the group label is the min member id.
    out.groupBy(_._3).foreach { case (g, ms) =>
      assert(ms.count(_._4 == 1) == 1, s"group $g keeper count")
      assert(ms.map(_._1).min == g, s"group $g label is min member id")
    }
    // Group members share a cluster (edges are intra-cluster only).
    out.groupBy(_._3).foreach { case (g, ms) =>
      assert(ms.map(_._2).distinct.length == 1, s"group $g spans clusters")
    }
    // Ground truth: recompute tau-edges within clusters and check the
    // components match (transitive closure over the same edge set).
    val vecs = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byCluster = out.groupBy(_._2)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    byCluster.values.foreach { ms =>
      val ids = ms.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        if (dot(vecs(ids(i)), vecs(ids(j))) >= tau) {
          val (a, b) = (find(ids(i)), find(ids(j)))
          if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        }
    }
    out.foreach { case (id, _, g, _) =>
      assert(find(id) == g, s"vec $id component mismatch")
    }
    // A removed member's group has >= 2 members (singletons are kept).
    out.filter(_._4 == 0).foreach { case (id, _, g, _) =>
      assert(out.count(_._3 == g) >= 2, s"vec $id removed from singleton group")
    }
  }

  test("q148 oracle replays the tau the engine actually ran with") {
    // Regression: the oracle used to hardcode `>= 0.4`, so dumping it
    // after a non-default-tau run silently verified the wrong threshold.
    Clustering.q148SemanticDedup(spark, sfDirMid, tau = 0.55)
    val afterCustom = Clustering.q148OracleSql.get
    assert(afterCustom.contains(">= 0.55"), afterCustom.linesIterator
      .filter(_.contains(">=")).mkString("; "))
    Clustering.q148SemanticDedup(spark, sfDirMid) // default restores 0.4
    assert(Clustering.q148OracleSql.get.contains(">= 0.4"))
  }
}
