package graft.operators

import org.apache.spark.sql.functions.explode

import graft.SparkSpec

/** BPE tokenizer training: algorithm correctness on a hand-worked
  * example, distributed == local merge-loop parity, and encode
  * invariants. */
class BpeTrainSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("learns the classic low/lower/lowest merges in order") {
    val docs = docsOf(1L -> "low low low lower lowest")
    val merges = BpeTrain.learnMerges(docs, nMerges = 4)
    assert(merges.toSeq == Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
  }

  test("stops early when nothing is left to merge") {
    val docs = docsOf(1L -> "ab cd")
    // 2 possible merges ((a,b),(c,d)) then single symbols remain
    val merges = BpeTrain.learnMerges(docs, nMerges = 10)
    assert(merges.length == 2)
    assert(merges.toSet == Set(("a", "b"), ("c", "d")))
  }

  test("distributed merge loop equals the local reference loop") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcde"
    val texts = (1L to 60L).map { i =>
      i -> Array.fill(4 + rnd.nextInt(12))(
        Array.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).mkString(" ")
    }
    val docs = docsOf(texts: _*)
    val local = BpeTrain.learnMerges(docs, nMerges = 12)
    // localVocabMax = 0 forces the distributed Dataset loop
    val dist = BpeTrain.learnMerges(docs, nMerges = 12, localVocabMax = 0)
    assert(dist.toSeq == local.toSeq)
  }

  test("encode: pieces concatenate back to the word; fully-merged words are one piece") {
    val docs = docsOf(1L -> "low low low lower lowest")
    val merges = BpeTrain.learnMerges(docs, nMerges = 4)
    val rank = merges.zipWithIndex.toMap
    assert(BpeTrain.encodeWord("lowest", rank).toSeq == Seq("lowe", "s", "t"))
    assert(BpeTrain.encodeWord("low", rank).toSeq == Seq("low"))
    // unseen symbols survive as singletons; concat always restores the word
    for (w <- Seq("lowest", "low", "zzz", "lozw", "l"))
      assert(BpeTrain.encodeWord(w, rank).mkString == w)
  }

  test("encodeStats counts words and pieces per document") {
    import org.apache.spark.sql.functions._
    val docs = docsOf(1L -> "low lowest", 2L -> "low")
    val merges = BpeTrain.learnMerges(docs, nMerges = 4)
    val got = BpeTrain.encodeStats(docs, merges)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(2L)._1 == 1L)
    // every piece count is between n_words (all merged) and total chars
    got.foreach { case (_, (w, p)) => assert(p >= w) }
    val one = BpeTrain.encodeStats(docs, merges)
      .where(col("doc_id") === 1L).head()
    assert(one.getLong(1) == 2L)
  }

  test("q107 on the real corpus: 20 ranked merges, deterministic across runs") {
    val a = BpeTrain.q107BpeMerges(spark, sfDir).collect().map(_.toSeq)
    val b = BpeTrain.q107BpeMerges(spark, sfDir).collect().map(_.toSeq)
    assert(a.length == 20)
    assert(a.toSeq == b.toSeq)
    // ranks are 1..20 and merged = left + right
    a.foreach { r => assert(r(3) == r(1).toString + r(2).toString) }
  }

  test("BPE tokenization is lossless: decode(encode(w)) == w for every corpus word and under random merge tables") {
    import spark.implicits._
    val merges = BpeTrain.learnMerges(
      graft.sources.Tables.documents(spark, sfDir), nMerges = 30)
    val rank = merges.zipWithIndex.toMap
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("w"))
      .where($"w" =!= "").distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(BpeTrain.encodeWord(w, rank).mkString == w, s"round-trip broke on '$w'")
    }
    // adversarial merge table: merges the corpus never saw, unsorted ranks
    val weird = Map(("x", "x") -> 0, ("ab", "c") -> 1, ("a", "b") -> 2)
    Seq("xxxxx", "abcabc", "", "a", "zzz xx").foreach { w =>
      assert(BpeTrain.encodeWord(w, weird).mkString == w)
    }
  }

  test("rank-chain oracle guard: passes on the real corpus, trips on merge aliasing") {
    // The corpora the oracles actually run against must satisfy the
    // rank-order-replace assumption the q115/q147 SQL encodes.
    for (d <- Seq(sfDir, sfDirMid)) {
      BpeTrain.assertRankChainEncodable(
        BpeTrain.learnMerges(graft.sources.Tables.documents(spark, d), nMerges = 20))
    }
    // Benign: a merge OUTPUT used as a HIGHER-rank component (normal BPE).
    BpeTrain.assertRankChainEncodable(Array(("a", "b"), ("ab", "c")))
    // Violation: a later merge's OUTPUT equals an earlier merge's
    // COMPONENT — ('a','bc') uses component "bc"; the later ('b','c')
    // produces "bc", creating instances the already-passed rank 1
    // would have consumed.
    val err = intercept[IllegalArgumentException](
      BpeTrain.assertRankChainEncodable(Array(("a", "bc"), ("b", "c"))))
    assert(err.getMessage.contains("oracle assumption violated"), err.getMessage)
  }
}
