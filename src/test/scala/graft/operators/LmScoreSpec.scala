package graft.operators

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  private def handCorpus = {
    import spark.implicits._
    Seq(
      (0L, "a b a b", "src0"),
      (1L, "a b c", "src1"),
      (2L, "c c", "src1"),
      (3L, "", "src1"),
      (4L, null.asInstanceOf[String], "src1"),
      (5L, "x y", "src2"),
    ).toDF("doc_id", "text", "source")
  }

  test("q149 fluency matches a hand-computed leave-one-out corpus") {
    val got = LmScore.fluencyOf(handCorpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // doc0 "a b a b": "a b"x2 seen in doc1 (5x2), "b a" only here but
    // w2=a seen elsewhere (2) -> 12/15.
    assert(got(0L) == ((3L, 12L, Some(12.0 / 15.0))))
    // doc1 "a b c": "a b" elsewhere (5), "b c" only here, c elsewhere (2).
    assert(got(1L) == ((2L, 7L, Some(7.0 / 10.0))))
    // doc2 "c c": bigram unique, c seen elsewhere -> 2/5.
    assert(got(2L) == ((1L, 2L, Some(2.0 / 5.0))))
    // Empty text and NULL text: zero bigrams, NULL fluency (0/0 rule).
    assert(got(3L) == ((0L, 0L, None)))
    assert(got(4L) == ((0L, 0L, None)))
    // doc5 "x y": neither bigram nor continuation seen elsewhere -> 0.
    assert(got(5L) == ((1L, 0L, Some(0.0))))
  }

  test("q150 target affinity matches hand-computed DSIR-lite weights") {
    import org.apache.spark.sql.functions.col
    val got = LmScore.targetAffinityOf(handCorpus, col("source") === "src0")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    // Slice tables (target = doc0): T=3, R=4, B=5 distinct bigrams.
    // doc0: num=2*3+1*2=8, den=2*2+1*1=5 -> 8*9/(5*8)=1.8
    assert(got(0L) == ((3L, 8L, 5L, Some(1.8))))
    // doc1: num=1*3+1*1=4, den=1*2+1*2=4 -> 4*9/(4*8)=1.125
    assert(got(1L) == ((2L, 4L, 4L, Some(1.125))))
    // doc2 and doc5: single unique-ish bigram -> 9/16
    assert(got(2L) == ((1L, 1L, 2L, Some(9.0 / 16.0))))
    assert(got(5L) == ((1L, 1L, 2L, Some(9.0 / 16.0))))
    // No bigrams -> NULL affinity, zero integer stats.
    assert(got(3L) == ((0L, 0L, 0L, None)))
    assert(got(4L) == ((0L, 0L, 0L, None)))
    // Target docs rank above raw docs on this corpus.
    assert(got(0L)._4.get > got(1L)._4.get)
  }

  test("q150 counts NULL-source docs in the raw slice (the oracle's ELSE semantics)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Three-valued-logic trap: source IS NULL makes `source = 'src0'`
    // NULL, and a naive when/otherwise slicing drops the doc's bigrams
    // from BOTH slices — while q150Sql's CASE ... ELSE c_f counts them
    // as raw. Parity oracle: NULL source must score exactly like an
    // unambiguous non-target source.
    val withNull = Seq(
      (0L, "a b a b", "src0"),
      (1L, "a b c", null.asInstanceOf[String]),
      (2L, "c c", "src1")).toDF("doc_id", "text", "source")
    val asRaw = Seq(
      (0L, "a b a b", "src0"),
      (1L, "a b c", "srcX"),
      (2L, "c c", "src1")).toDF("doc_id", "text", "source")
    graft.util.PlanCache.clearAll()
    val got = LmScore.targetAffinityOf(withNull, col("source") === "src0")
      .drop("source").collect().map(_.toString)
    graft.util.PlanCache.clearAll()
    val want = LmScore.targetAffinityOf(asRaw, col("source") === "src0")
      .drop("source").collect().map(_.toString)
    assert(got.sameElements(want),
      s"NULL-source slicing diverged: ${got.mkString(",")} vs ${want.mkString(",")}")
  }

  test("q149/q150 cover every document at corpus scale with bounded scores") {
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    val fl = LmScore.q149LmFluency(spark, sfDir).collect()
    assert(fl.length == n)
    fl.filter(!_.isNullAt(3)).foreach { r =>
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0, s"fluency out of range: $f")
    }
    val af = LmScore.q150TargetAffinity(spark, sfDir).collect()
    assert(af.length == n)
    af.filter(!_.isNullAt(5)).foreach { r =>
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("fluencyAgainst scores new docs off the standing store; incremental == rebuild") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("lm-store-a").toString
    val dirAB = java.nio.file.Files.createTempDirectory("lm-store-ab").toString
    val corpusA = Seq((100L, "a b a b"), (101L, "a b c")).toDF("doc_id", "text")
    val corpusB = Seq((102L, "c d")).toDF("doc_id", "text")
    CorpusStatsStore.build(corpusA, dirA)
    CorpusStatsStore.build(corpusA.unionByName(corpusB), dirAB)
    val newDocs = Seq(
      (0L, "a b x"),          // "a b" known (5), "b x": x never a continuation (0)
      (1L, "x a"),            // "x a": bigram unknown, a seen as continuation? "b a" exists -> 2
      (2L, ""),               // no bigrams -> NULL
      (3L, "q z"),            // nothing known -> 0
    ).toDF("doc_id", "text")
    graft.util.PlanCache.clearAll()
    val got = LmScore.fluencyAgainst(newDocs, dirA).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(0L) == ((2L, 5L, Some(0.5))))
    assert(got(1L) == ((1L, 2L, Some(0.4))))
    assert(got(2L) == ((0L, 0L, None)))
    assert(got(3L) == ((1L, 0L, Some(0.0))))
    // Incremental: update(A-store, B) must equal build(A union B).
    CorpusStatsStore.update(corpusB, dirA)
    graft.util.PlanCache.clearAll()
    val inc = LmScore.fluencyAgainst(newDocs, dirA).collect().map(_.toString)
    graft.util.PlanCache.clearAll()
    val full = LmScore.fluencyAgainst(newDocs, dirAB).collect().map(_.toString)
    assert(inc.sameElements(full), "incremental store != one-shot rebuild")
    // The new "c d" evidence is visible: doc "q z" stays 0, but a doc
    // ending in d now backs off to the continuation.
    graft.util.PlanCache.clearAll()
    val got2 = LmScore.fluencyAgainst(Seq((9L, "z d")).toDF("doc_id", "text"), dirA)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got2.head == ((1L, 2L, 0.4)))
  }

  test("affinityAgainst on two slice stores equals the in-session q150 on the same corpus") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tDir = java.nio.file.Files.createTempDirectory("dsir-target").toString
    val rDir = java.nio.file.Files.createTempDirectory("dsir-raw").toString
    val docs = handCorpus
    CorpusStatsStore.build(docs.where(col("source") === "src0"), tDir)
    CorpusStatsStore.build(docs.where(col("source") =!= "src0"), rDir)
    graft.util.PlanCache.clearAll()
    val stored = LmScore.affinityAgainst(docs, tDir, rDir)
      .collect().map(_.toString).sorted
    graft.util.PlanCache.clearAll()
    val inSession = LmScore.targetAffinityOf(docs, col("source") === "src0")
      .drop("source").collect().map(_.toString).sorted
    assert(stored.sameElements(inSession),
      s"stored=${stored.mkString(",")} vs ${inSession.mkString(",")}")
    // Incremental raw-slice growth == rebuild.
    val extra = Seq((6L, "c c c", "src3")).toDF("doc_id", "text", "source")
    CorpusStatsStore.update(extra, rDir)
    val rDir2 = java.nio.file.Files.createTempDirectory("dsir-raw2").toString
    CorpusStatsStore.build(
      docs.where(col("source") =!= "src0").unionByName(extra), rDir2)
    graft.util.PlanCache.clearAll()
    val inc = LmScore.affinityAgainst(docs, tDir, rDir).collect().map(_.toString)
    graft.util.PlanCache.clearAll()
    val full = LmScore.affinityAgainst(docs, tDir, rDir2).collect().map(_.toString)
    assert(inc.sameElements(full))
  }
}
