package graft.operators

import graft.SparkSpec

/** Invariants for the fingerprint operator (portable polynomial hash;
  * the exact values are oracle-checked by q30 — these pin the semantics)
  * and sanity for the oracle-checked text analysis. */
class TextAnalysisSpec extends SparkSpec {

  test("identical texts produce identical fingerprint sets; different texts differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words occupy this sentence for the test case here now")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("fingerprint covers every document with at least one fingerprint") {
    val rows = TextAnalysis.fingerprint(spark, sfDirMid).collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getAs[Long]("n_fingerprints") >= 1))
  }

  test("quality keep flag honors token bounds") {
    val rows = TextAnalysis.qualityScore(spark, sfDirMid).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val keep = r.getAs[Boolean]("keep")
      if (n < 20 || n > 1000) assert(!keep)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
  }

  test("vocab coverage is an exact ratio in [0,1] covering every doc") {
    val rows = TextAnalysis.vocabCoverage(spark, sfDirMid).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val hits = r.getAs[Long]("n_in_vocab")
      val cov = r.getAs[Double]("coverage")
      assert(hits >= 0 && hits <= n)
      assert(cov == hits.toDouble / n)
    }
  }

  test("a full-vocabulary corpus scores coverage 1.0; an OOV doc 0.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta beta beta"), (3L, "zz yy xx")
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.vocabCoverageOf(docs, k = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("coverage")).toMap
    assert(byId(1L) == 1.0 && byId(2L) == 1.0 && byId(3L) == 0.0)
  }

  test("top tokens per lang are rank-ordered with deterministic ties") {
    val rows = TextAnalysis.topTokensPerLang(spark, sfDirMid, k = 5).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      assert(ordered.map(_.getAs[Int]("rn")).toSeq == (1 to ordered.length))
      // counts non-increasing with rank; equal counts ordered by token
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
          assert(na > nb || (na == nb &&
            a.getAs[String]("tok") < b.getAs[String]("tok")))
        case _ =>
      }
    }
  }

  test("compression ratio: repetitive << prose < random, and deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = Seq(
      (1L, "spam " * 200),                                  // degenerate repetition
      (2L, (1 to 150).map(n => s"token$n word${n * 7 % 50}").mkString(" ")),
      (3L, Seq.fill(1000)((rnd.nextInt(93) + 33).toChar).mkString)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatioOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L))
    assert(out(1L) < 0.1)   // repeated token deflates to almost nothing
    assert(out(3L) > 0.7)   // pseudo-random glyphs barely deflate
    val again = TextAnalysis.compressionRatioOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == again)
  }

  test("compression ratio: empty text yields null ratio, not Infinity") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "some actual prose to score here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatioOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(3))          // n_bytes = 0 -> no ratio
    assert(!out(1L).getBoolean(4))       // keep = false (null fails between)
    assert(out(2L).getDouble(3) > 0.0 && !out(2L).getDouble(3).isInfinity)
  }

  test("compression ratio on the real corpus: sane bounds, every doc scored") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = TextAnalysis.compressionRatio(spark, sfDir).collect()
    assert(out.length == docs.where(docs("text").isNotNull).count())
    assert(out.forall { r =>
      val ratio = r.getDouble(3)
      ratio > 0.0 && ratio <= 1.2 // tiny docs can exceed 1.0 (header overhead)
    })
  }

  test("cleanText: NFC composition, zero-width strip, control chars, space runs") {
    import spark.implicits._
    graft.functions.NormalizeNfc.register(spark)
    val decomposed = "caf" + "é" // e + combining acute
    val cases = Seq(
      (1L, decomposed),                     // → café (composed U+00E9)
      (2L, "a​b﻿c"),              // zero-width chars vanish
      (3L, "line1\r\nline2\tend"),          // CRLF + tab → single spaces
      (4L, "  spaced   out  "),             // runs collapse, ends trim
      (5L, "already clean ascii"),          // identity
      (6L, null.asInstanceOf[String])       // null survives as null
    ).toDF("doc_id", "text")
    val out = cases.select($"doc_id", TextAnalysis.cleanText($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café")
    assert(out(2L) == "abc")
    assert(out(3L) == "line1 line2 end")
    assert(out(4L) == "spaced out")
    assert(out(5L) == "already clean ascii")
    assert(out(6L) == null)
  }

  test("cleanText normalization makes canonically-equal texts dedup-equal") {
    import spark.implicits._
    graft.functions.NormalizeNfc.register(spark)
    val composed = "résumé text here"
    val decomposed = "résumé text here"
    assert(composed != decomposed) // different bytes...
    val out = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      .select(TextAnalysis.cleanText($"text").as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1)) // ...same text after the chain
  }

  test("bigram lift: hand-computed position-marginal lift, lift-desc/bigram-asc order") {
    import spark.implicits._
    // bigrams: (a,b)x2, (b,a)x1, (b,c)x1; N=4
    // c_first: a->2, b->2; c_second: a->1, b->2, c->1
    // lift(a b)=2*4/(2*2)=2.0  lift(b a)=1*4/(2*1)=2.0  lift(b c)=1*4/(2*1)=2.0
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLiftOf(docs, n = 10, minCount = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(out == List(("a b", 2L, 2.0), ("b a", 1L, 2.0), ("b c", 1L, 2.0)))
  }

  test("bigram lift separates association from raw frequency") {
    import spark.implicits._
    // "x y" always co-occurs (lift max); "the the" is frequent but its
    // parts are everywhere, so lift ~ 1.
    val docs = Seq(
      (1L, "the the the the x y the the x y"),
      (2L, "the x y the the the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLiftOf(docs, n = 3, minCount = 2).collect()
      .map(r => r.getString(0)).toList
    assert(out.head == "x y")
    assert(out.contains("x y") && out.length <= 3)
  }

  test("fingerprint pairs: winnowing coverage guarantees a shared long run surfaces") {
    import spark.implicits._
    // k=4, w=5 → any shared run of ≥ w+k−1 = 8 tokens must yield ≥1
    // common fingerprint; this run is much longer, and minShared=1
    // isolates the coverage bound from the default threshold.
    val run = (1 to 30).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma"),
      (2L, s"$run delta epsilon zeta"),
      (3L, "totally different content with no overlap at all here"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fps = TextAnalysis.fingerprintSetOf(docs)
    val shared = fps.as("a").join(fps.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shared.contains((1L, 2L)))
    assert(!shared.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("over-cap familiarity fails over to the join spelling with identical scores") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.jvmTokens
    val docs = graft.sources.Tables.documents(spark, sfDirMid)
      .where($"doc_id" % 10 === 0)
    val counts = docs.where($"text".isNotNull).select($"text").as[String]
      .flatMap(t => jvmTokens(t).sliding(2).withFilter(_.length == 2)
        .map(_.mkString(" ")))
      .toDF("bigram").groupBy($"bigram").agg(count(lit(1)).as("n"))
    val mapOnly = TextAnalysis
      .familiarityScoreKeyed(docs, counts, identity)
      .collect().map(_.toString).sorted.toSeq
    // cap=0 forces the over-vocabulary-cap path: the Generate→join→
    // re-aggregate fallback (no driver collect) must score identically
    val joined = TextAnalysis
      .familiarityScoreKeyed(docs, counts, identity, cap = 0)
      .collect().map(_.toString).sorted.toSeq
    assert(mapOnly.nonEmpty && mapOnly == joined,
      "join-spelling fallback diverged from the map-only kernel")
  }
}
