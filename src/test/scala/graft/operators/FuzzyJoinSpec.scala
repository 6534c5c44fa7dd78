package graft.operators

import graft.SparkSpec

/** FastSS deletion-neighborhood fuzzy join: lossless blocking for edit
  * distance <= 1 — must equal the brute-force quadratic join exactly. */
class FuzzyJoinSpec extends SparkSpec {

  test("finds substitution, insertion, deletion and exact-dup pairs") {
    import spark.implicits._
    val df = Seq(
      (1L, "kitten"), (2L, "kitten"),  // exact dup -> dist 0
      (3L, "kittex"),                  // substitution vs 1,2
      (4L, "kitte"),                   // deletion vs 1,2; substitution-insert vs 3
      (5L, "skitten"),                 // insertion vs 1,2
      (6L, "dog")                      // unrelated
    ).toDF("id", "name")
    val got = FuzzyJoin.pairsWithin1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val names = Map(1L -> "kitten", 2L -> "kitten", 3L -> "kittex",
      4L -> "kitte", 5L -> "skitten", 6L -> "dog")
    val want = (for {
      a <- names.keys; b <- names.keys if a < b
      d = levenshteinRef(names(a), names(b)) if d <= 1
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 0)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("empty and single-char strings survive and pair correctly") {
    import spark.implicits._
    // "" has no deletion variants (used to NegativeArraySizeException);
    // it pairs with every single-char string (one insertion) and the
    // other empty (dist 0).
    val df = Seq((1L, ""), (2L, ""), (3L, "a"), (4L, "b"), (5L, "ab"))
      .toDF("id", "name")
    val got = FuzzyJoin.pairsWithin1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val names = Map(1L -> "", 2L -> "", 3L -> "a", 4L -> "b", 5L -> "ab")
    val want = (for {
      a <- names.keys; b <- names.keys if a < b
      d = levenshteinRef(names(a), names(b)) if d <= 1
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 0)))
    assert(got.contains((1L, 3L, 1)))
  }

  test("blocked pairs equal brute force on real customer names") {
    import spark.implicits._
    val c = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_custkey", $"c_name")
    val got = FuzzyJoin.pairsWithin1(c, "c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val names = c.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, na) <- names; (ib, nb) <- names if ia < ib
      d = levenshteinRef(na, nb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(got.nonEmpty) // zero-padded numeric names differ in single digits
  }

  /** Textbook DP edit distance, the spec's independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
