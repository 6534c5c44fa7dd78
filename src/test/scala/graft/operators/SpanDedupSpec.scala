package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sub-document duplication: span coverage (interval union) and
  * within-document segment dedup (zero-shuffle array_distinct). */
class SpanDedupSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("overlapping duplicated spans union, not double-count") {
    // k=2, the bigram "b b" repeats inside doc 1 at pos 1,2,3 (overlap
    // chain) and in doc 2 — union in doc 1 = [1,4] -> 4 tokens, not 3*2.
    val docs = docsOf(
      1L -> "a b b b b c",
      2L -> "x b b y",
      3L -> "p q r s")
    val rows = SpanDedup.dupSpanCoverageOf(docs, k = 2, minCount = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((6L, 4L)))  // spans [1,2],[2,3],[3,4] -> union 1..4
    assert(rows(2L) == ((4L, 2L)))  // span [1,2]
    assert(rows(3L) == ((4L, 0L)))  // nothing duplicated
    assert(rows.keySet == Set(1L, 2L, 3L))
  }

  test("coverage equals brute-force interval union on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d")
    val k = 3
    val texts = (1L to 40L).map(i =>
      i -> Array.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val got = SpanDedup.dupSpanCoverageOf(docsOf(texts: _*), k = k, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: count all k-shingles, mark covered token positions
    val shingled = texts.map { case (id, t) =>
      val toks = t.toLowerCase.split(' ')
      id -> (toks, toks.sliding(k).filter(_.length == k).map(_.mkString(" ")).toArray)
    }
    val counts = shingled.flatMap(_._2._2).groupBy(identity).map { case (s, o) => s -> o.length }
    val want = shingled.map { case (id, (toks, shs)) =>
      val covered = Array.fill(toks.length)(false)
      shs.zipWithIndex.foreach { case (s, i) =>
        if (counts(s) >= 2) (i until i + k).foreach(covered(_) = true)
      }
      (id, toks.length.toLong, covered.count(identity).toLong)
    }.toSet
    assert(got == want)
  }

  test("span pairs: maximal shared runs with positions in both docs") {
    // doc 1 and doc 2 share a 9-token run at different offsets; doc 3
    // shares nothing long enough. k=3, minRun=5.
    val run = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    val docs = docsOf(
      (1L, s"a1 a2 $run a3 a4"),
      (2L, s"b1 b2 b3 b4 $run"),
      (3L, "c1 c2 r1 r2 r3 c3 c4"))
    val rows = SpanDedup.spanPairsOf(docs, k = 3, minRunTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))
    // exactly one qualifying run: docs (1,2), starts 2 and 4, 9 tokens
    assert(rows.toSeq == Seq((1L, 2L, 2, 4, 9L)))
    // the doc-3 3-token overlap is below the run threshold
    assert(!rows.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("span pairs: two separate runs on the same pair stay separate islands") {
    val docs = docsOf(
      (1L, "x1 x2 x3 x4 g1 g2 y1 y2 y3 y4"),
      (2L, "x1 x2 x3 x4 h1 h2 h3 y1 y2 y3 y4"))
    val rows = SpanDedup.spanPairsOf(docs, k = 3, minRunTokens = 4)
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getLong(4))).toSet
    // run 1: "x1..x4" at (0,0), 4 tokens; run 2: "y1..y4" at (6,7), 4 tokens
    assert(rows == Set((0, 0, 4L), (6, 7, 4L)))
  }

  test("intra-doc segment dedup keeps first occurrences in order") {
    val docs = docsOf(
      1L -> "a b a b c d a b",   // 2-token segs: "a b","a b","c d","a b" -> keep "a b","c d"
      2L -> "x y z",             // segs "x y","z" -> unchanged
      3L -> "q q q q")           // segs "q q","q q" -> "q q"
    val got = SpanDedup.dedupSegmentsIntraDocOf(docs, segTokens = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((4L, 2L, "a b c d")))
    assert(got(2L) == ((2L, 2L, "x y z")))
    assert(got(3L) == ((2L, 1L, "q q")))
  }

  test("intra-doc dedup is idempotent and never reorders surviving segments") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Array("u", "v", "w")
    val texts = (1L to 30L).map(i =>
      i -> Array.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val once = SpanDedup.dedupSegmentsIntraDocOf(docsOf(texts: _*), segTokens = 2)
    val cleaned = once.select($"doc_id", $"clean_text".as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length($"text").cast("long"))
    val twice = SpanDedup.dedupSegmentsIntraDocOf(cleaned, segTokens = 2)
    val a = once.select($"doc_id", $"clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = twice.select($"doc_id", $"clean_text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    // surviving segments appear in original relative order
    texts.foreach { case (id, t) =>
      val segs = t.toLowerCase.split(' ').grouped(2).map(_.mkString(" ")).toArray
      val kept = a(id).split(' ').grouped(2).map(_.mkString(" ")).toArray
      // kept must be the first-occurrence subsequence of segs
      val firstSeen = scala.collection.mutable.LinkedHashSet[String]()
      segs.foreach(firstSeen += _)
      assert(kept.map(_.trim).mkString("|") ==
        firstSeen.toArray.map(_.trim).mkString("|"))
    }
  }

  test("template share scores without rewriting; planted chrome scores high") {
    import spark.implicits._
    // 2-token segments, df>=2 across distinct docs = template
    val chrome = "accept cookies"
    val docs = docsOf(
      1L -> s"$chrome unique alpha words",         // segs: chrome + 2 others
      2L -> s"$chrome other beta tokens",
      3L -> s"$chrome $chrome $chrome")            // all-template doc
    val got = Dedup.templateShareOf(docs, segTokens = 2, minDf = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(3L) == ((3L, 3L, 1.0)))
    // in-doc repetition alone is NOT template: df counts distinct docs
    val solo = docsOf(1L -> "own chant own chant own chant",
      2L -> "completely different words here")
    val soloGot = Dedup.templateShareOf(solo, segTokens = 2, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(soloGot(1L) == 0L)
  }

  test("bigram familiarity: corpus-relative threshold and buckets") {
    // bigrams: doc1 "a b","b a","a b" doc2 "a b","b c"; counts:
    // "a b"->3, "b a"->1, "b c"->1; total=5, distinct=3 -> familiar
    // iff 3n >= 5 -> only "a b".
    val docs = docsOf(1L -> "a b a b", 2L -> "a b c")
    val got = TextAnalysis.bigramFamiliarityOf(docs)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0, "middle")))
    assert(got(2L) == ((2L, 1L, 0.5, "middle")))
    // single-token doc has no bigrams -> excluded
    val withShort = docsOf(1L -> "a b a b", 2L -> "a b c", 3L -> "solo")
    val ids = TextAnalysis.bigramFamiliarityOf(withShort)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }
}
