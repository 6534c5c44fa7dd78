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

  test("IVF ANN recall >= 0.8 vs brute force (k-means quantizer, nProbe=4/16)") {
    val ivf = resultSet(Similarity.annIvf(spark, sfDirMid, 5, 10))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("k-means centroids are unit vectors and deterministic across runs") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val e = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
      .as[(Long, Array[Double])]
    val a = Similarity.kmeansCentroids(e, 16, 4)
    val b = Similarity.kmeansCentroids(e, 16, 4)
    assert(a.length == 16)
    a.foreach { case (_, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
    assert(a.map(_._1).sameElements(b.map(_._1)))
    assert(a.zip(b).forall { case ((_, va), (_, vb)) => va.sameElements(vb) })
  }

  test("LSH ANN recall >= 0.4 vs brute force (6 planes, hamming<=2 probes)") {
    val lsh = resultSet(Similarity.annLsh(spark, sfDirMid, 5, 10))
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"LSH recall $recall")
  }

  test("LSH sign matrix reproduces the column-expression signatures") {
    // q26's oracle rebuilds signatures from lshSignMatrix literals; the
    // matrix and the in-plan lshSignature column must agree on every
    // vector or the oracle drifts from the engine. Compare both on the
    // full corpus (sign decisions, not float hashes).
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val signs = Similarity.lshSignMatrix(64)
    val e = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
    val engineSigs = e.select($"vec_id", Similarity.lshSignature($"v", 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    raw.foreach { case (id, vec) =>
      var sig = 0
      for (p <- 0 until Similarity.LshPlanes) {
        var proj = 0.0
        for (j <- vec.indices) proj += vec(j).toDouble * signs(p)(j)
        if (proj > 0) sig |= 1 << p
      }
      assert(sig == engineSigs(id), s"vec $id: matrix sig $sig != engine ${engineSigs(id)}")
    }
  }

  private lazy val hardNeg = resultSet(Similarity.hardNegatives(spark, sfDirMid, 5, 10))

  test("hard negatives: every returned pair crosses labels, k per anchor") {
    val labels = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byAnchor = hardNeg.groupBy(_._1)
    assert(byAnchor.size == 10)
    byAnchor.foreach { case (_, ns) => assert(ns.size == 5) }
    assert(hardNeg.forall { case (a, n) => labels(a) != labels(n) })
  }

  test("hard negatives differ from plain top-k where the neighborhood is same-label") {
    // with 10 balanced labels most near-neighbors cross labels, but the
    // two sets must not be forced equal — at least the label invariant
    // separates them on any anchor whose top-k contains a same-label hit
    val labels = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sameLabelInTopK = brute.exists { case (q, n) => labels(q) == labels(n) }
    if (sameLabelInTopK) assert(hardNeg != brute)
  }

  test("IVF hard negatives: recall >= 0.8 vs exact, label invariant holds") {
    val ivf = resultSet(Similarity.hardNegativesIvf(spark, sfDirMid, 5, 10))
    val labels = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivf.forall { case (a, n) => labels(a) != labels(n) })
    val recall = hardNeg.intersect(ivf).size.toDouble / hardNeg.size
    assert(recall >= 0.8, s"IVF hard-negative recall $recall")
  }

  test("IVF returns at most k neighbors per query, none equal to the query") {
    val ivf = Similarity.annIvf(spark, sfDirMid, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ivf.groupBy(_._1).foreach { case (_, ns) => assert(ns.length <= 5) }
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("PQ-ADC recall >= 0.6 vs brute force (8x16 codebooks, 10x rerank)") {
    val pq = resultSet(ProductQuantization.annPq(spark, sfDirMid, 5, 10))
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall")
    // exactly <= k per query, never the query itself
    pq.groupBy(_._1).foreach { case (_, ns) => assert(ns.size <= 5) }
    assert(pq.forall { case (q, n) => q != n })
  }

  test("PQ codebooks are deterministic and encoding covers every vector") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val e = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
      .as[(Long, Array[Double])]
    val a = ProductQuantization.trainCodebooks(e, 8, 16, 2)
    val b = ProductQuantization.trainCodebooks(e, 8, 16, 2)
    assert(a.length == 8 && a(0).length == 16 && a(0)(0).length == 8)
    assert(a.zip(b).forall { case (ba, bb) =>
      ba.zip(bb).forall { case (ca, cb) => ca.sameElements(cb) } })
    val codes = ProductQuantization.encode(e, a)
    assert(codes.count() == e.count())
    val lens = codes.select($"codes").as[Array[Byte]].collect().map(_.length).toSet
    assert(lens == Set(8))
  }

  test("codegen L2Normalize is bit-identical to the higher-order-function form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The old interpreted form the expression replaced, verbatim.
    def hofNormalized(v: org.apache.spark.sql.Column) = {
      val d = transform(v, x => x.cast("double"))
      val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
      transform(d, x => when(norm === 0.0, 0.0).otherwise(x / norm))
    }
    // Real corpus: every vector, both forms, element-for-element bits.
    val e = graft.sources.Tables.embeddings(spark, sfDirMid)
      .select($"vec_id",
        Similarity.normalized($"embedding").as("a"),
        hofNormalized($"embedding").as("b"))
      .collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      val (a, b) = (r.getSeq[Double](1), r.getSeq[Double](2))
      assert(a.size == b.size && a.zip(b).forall { case (x, y) =>
        java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y)
      }, s"vec ${r.getLong(0)} diverged")
    }
    // Specials: zero vector stays zeros (not NaN), squared underflow
    // collapses to zeros, NaN propagates, empty stays empty, a null
    // element nulls the result, and float inputs cast exactly.
    val special = Seq(
      Array(0.0f, 0.0f), Array(1e-30f, 0.0f), Array(Float.NaN, 1.0f),
      Array.empty[Float], Array(3.0f, 4.0f))
      .toDF("v").select(Similarity.normalized($"v").as("n")).collect()
    assert(special(0).getSeq[Double](0) == Seq(0.0, 0.0))
    assert(special(1).getSeq[Double](0) == Seq(1.0, 0.0)) // 1e-60 is fine in double
    assert(special(2).getSeq[Double](0).forall(_.isNaN))
    assert(special(3).getSeq[Double](0).isEmpty)
    assert(special(4).getSeq[Double](0) == Seq(0.6, 0.8))
    // squared-underflow needs a DOUBLE input (float² can't reach 1e-308):
    // sum-of-squares rounds to 0.0, and the zero-norm rule yields zeros
    // (the old when(norm===0) form did the same), never an Inf vector.
    val under = Seq(Tuple1(Array(1e-200, 0.0)))
      .toDF("v").select(Similarity.normalized($"v").as("n")).collect()
    assert(under(0).getSeq[Double](0) == Seq(0.0, 0.0))
    val withNull = Seq(Tuple1(Seq[Option[Double]](Some(1.0), None)))
      .toDF("v").select(Similarity.normalized($"v").as("n")).collect()
    assert(withNull(0).isNullAt(0), "null element must null the result")
  }
}
