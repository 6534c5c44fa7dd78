package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Enforces the 100 TB IVF-blocking posture in code: auto-sizing
  * (nLists ~ √n, probes from a recall target) must keep candidate
  * volume sublinear in n² as the corpus grows — measured on a synthetic
  * corpus and its 10× scale-up — while planted near-dups stay
  * recoverable at the recall target. */
class IvfAutoSizeSpec extends SparkSpec {

  /** splitmix64 → uniform double in [-0.5, 0.5); deterministic. */
  private def rng(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  private val Dim = 8

  /** n unit vectors; rows (2k, 2k+1) for k < nPlant are near-identical
    * planted duplicate pairs, the rest pseudo-random. */
  private def corpus(n: Int, nPlant: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val baseSeed = if (i < 2 * nPlant) 1000000L + (i / 2) else 2000000L + i
      val jitter = if (i < 2 * nPlant && i % 2 == 1) 0.02 else 0.0
      val raw = Array.tabulate(Dim)(j =>
        rng(baseSeed * 31 + j) + jitter * rng(i.toLong * 131 + j))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(_ / norm))
    }
    spark.createDataset(rows).toDF("vec_id", "v")
  }

  private def candidateCount(e: DataFrame, n: Long): Long = {
    import spark.implicits._
    val (nLists, nAssign) = Similarity.ivfAutoSizing(n)
    val probes = Similarity.ivfProbes(e, nLists, 4, nAssign)
    probes.as("a").join(probes.as("b"),
        $"a.cent_id" === $"b.cent_id" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id").distinct().count()
  }

  test("ivfAutoSizing: nLists ~ sqrt(n), probes from the recall target") {
    assert(Similarity.ivfAutoSizing(100) == (16, 3))      // floor at 16 lists
    assert(Similarity.ivfAutoSizing(500) == (23, 3))
    assert(Similarity.ivfAutoSizing(1000000) == (1000, 3))
    assert(Similarity.ivfAutoSizing(1000000, recallTarget = 0.99) == (1000, 5))
    assert(Similarity.ivfAutoSizing(0) == (16, 3))        // list floor at n=0
    assert(Similarity.ivfAutoSizing(1000, 0.5)._2 == 2)   // probe floor
    intercept[IllegalArgumentException](Similarity.ivfAutoSizing(10, 1.0))
  }

  test("auto-sized candidate volume is sublinear in n^2 on a 10x corpus") {
    graft.functions.CosineSimilarity.register(spark)
    val n1 = 600
    val n2 = 6000
    val c1 = candidateCount(corpus(n1, 0), n1)
    val c2 = candidateCount(corpus(n2, 0), n2)
    def allPairs(n: Long): Double = n.toDouble * (n - 1) / 2
    val frac1 = c1 / allPairs(n1)
    val frac2 = c2 / allPairs(n2)
    info(f"candidates: $c1 of ${allPairs(n1)}%.0f ($frac1%.3f) -> " +
      f"$c2 of ${allPairs(n2)}%.0f ($frac2%.3f); growth ${c2.toDouble / c1}%.1f x")
    // All-pairs would grow 100x over a 10x corpus; √n lists give
    // Θ(a²·n^1.5) candidates — ~32x. Assert well below quadratic and
    // that the candidate FRACTION of all pairs shrinks as n grows.
    assert(c2.toDouble / c1 <= 50.0, s"candidate growth $c2/$c1 not sublinear in n^2")
    assert(frac2 < frac1, s"candidate fraction must shrink with n: $frac1 -> $frac2")
  }

  test("auto sizing recovers planted near-dups at the recall target") {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val n = 600
    val nPlant = 60
    val e = corpus(n, nPlant)
    val (nLists, nAssign) = Similarity.ivfAutoSizing(n)
    val probes = Similarity.ivfProbes(e, nLists, 4, nAssign)
    val got = Dedup.blockedPairsOf(e, probes, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Exact brute-force ground truth, driver-side (600 vectors).
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val brute = (for {
      a <- 0L until n; b <- (a + 1) until n
      if vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum >= 0.95
    } yield (a, b)).toSet
    assert(brute.size >= nPlant, s"corpus must contain the planted dups: ${brute.size}")
    assert(got.subsetOf(brute), "verified candidates can never be false positives")
    val recall = got.size.toDouble / brute.size
    info(f"auto-sized recall: $recall%.3f (${got.size}/${brute.size})")
    assert(recall >= 0.9, s"recall $recall below target")
  }
}
