package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The feature-hashed familiarity dial ([[TextAnalysis.familiarityHashed]])
  * vs the exact form it approximates: at the production bucket count
  * (2^20) the test-SF vocabulary collides almost nowhere, so scores must
  * agree to rounding; at an undersized bucket count the degradation must
  * be graceful (still strongly rank-correlated), because that is the
  * regime the dial is FOR — a 100 TB corpus whose vocabulary dwarfs any
  * fixed table. Collision rate itself is pinned under the vocab/buckets
  * birthday-style bound so the "≲ a few percent at 2^20" scaling claim
  * in the scaladoc is measured, not asserted.
  */
class FamiliarityHashedSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDirMid)

  /** (doc_id → familiarity) map of a scoring frame. */
  private def scores(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.select(col("doc_id").cast("string"), col("familiarity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val (sx, sy) = (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum),
      math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
    cov / (sx * sy)
  }

  /** Spearman with average ranks for ties (scores cluster at 1.0). */
  private def spearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val out = Array.ofDim[Double](v.size)
      var i = 0
      while (i < sorted.size) {
        var j = i
        while (j + 1 < sorted.size && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j) / 2.0 + 1.0
        (i to j).foreach(k => out(sorted(k)._2) = avg)
        i = j + 1
      }
      out.toSeq
    }
    pearson(ranks(xs), ranks(ys))
  }

  test("collision rate at 2^20 buckets stays under vocab/buckets") {
    import spark.implicits._
    val buckets = 1 << 20
    val bigrams = docs.where($"text".isNotNull)
      .select(explode(graft.functions.TextFunctions.shingles($"text", 2)).as("bigram"))
      .distinct()
    val vocab = bigrams.count()
    val used = bigrams
      .select(pmod(xxhash64($"bigram"), lit(buckets.toLong)).as("b"))
      .distinct().count()
    val collided = vocab - used
    // birthday expectation is vocab²/(2·buckets) merged keys; allow 2×
    // that plus one (integer slack for a vocab small enough that the
    // expectation itself is fractional). The vocab/buckets FRACTION
    // bound in the scaladoc follows: collided/vocab ≤ vocab/buckets.
    val bound = math.max(1L, vocab * vocab / buckets)
    assert(vocab > 500, s"vocab=$vocab — corpus too small for the bound to mean anything")
    assert(collided <= bound,
      s"$collided collisions exceed the birthday bound $bound (vocab=$vocab used=$used)")
    assert(collided.toDouble / vocab <= math.max(vocab.toDouble / buckets, 1.0 / vocab))
  }

  test("2^20-bucket scores match the exact form to rounding; ranks agree") {
    val exact = scores(TextAnalysis.bigramFamiliarityOf(docs))
    val hashed = scores(TextAnalysis.familiarityHashed(docs, 1 << 20))
    assert(exact.keySet == hashed.keySet)
    val ids = exact.keySet.toSeq.sorted
    val (xs, ys) = (ids.map(exact), ids.map(hashed))
    val maxAbs = xs.zip(ys).map { case (a, b) => math.abs(a - b) }.max
    assert(maxAbs <= 0.02, s"max |exact - hashed| = $maxAbs at 2^20 buckets")
    assert(spearman(xs, ys) >= 0.99, s"spearman=${spearman(xs, ys)}")
  }

  test("undersized bucket table degrades gracefully (rank order survives)") {
    val exact = scores(TextAnalysis.bigramFamiliarityOf(docs))
    val hashed = scores(TextAnalysis.familiarityHashed(docs, 1 << 14))
    val ids = exact.keySet.toSeq.sorted
    val (xs, ys) = (ids.map(exact), ids.map(hashed))
    val rho = spearman(xs, ys)
    assert(rho >= 0.8, s"spearman=$rho at 2^14 buckets — hashing destroyed the ranking")
  }
}
