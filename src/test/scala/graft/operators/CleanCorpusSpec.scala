package graft.operators

import graft.SparkSpec

/** The cleaning pipeline must drop exactly the planted junk: low
  * quality, exact duplicates, near duplicates — keeping one
  * representative per duplicate cluster. */
class CleanCorpusSpec extends SparkSpec {

  test("pipeline drops quality failures, exact dups, and near-dups keeping keepers") {
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog and then runs far away " +
      "to find more interesting words for this synthetic document corpus today"
    val docs = Seq(
      // 1: good doc (keeper of near-dup cluster with 2 and exact-dup 3)
      (1L, base),
      (2L, base + " extra"),          // near-dup of 1
      (3L, base.toUpperCase),         // exact dup of 1 after normalization
      (4L, "short text here"),        // quality fail: < 20 tokens
      (5L, "completely different content about databases engines queries plans " +
        "optimizers shuffles partitions executors drivers caching storage formats " +
        "and various other technical topics worth keeping around")
    ).map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")

    val (cleaned, stats) = CleanCorpus.clean(docs, jaccardThreshold = 0.5)
    val kept = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(stats.input == 5)
    assert(stats.afterQuality == 4)   // 4 dropped (too short)
    assert(stats.afterDecontam == 4)  // no eval set supplied → no-op
    assert(stats.afterExact == 3)     // 3 dropped (exact dup of 1)
    assert(stats.afterNearDup == 2)   // 2 dropped (near-dup of 1)
    assert(kept == Set(1L, 5L))
  }

  test("surviving documents come out PII-scrubbed") {
    import spark.implicits._
    val withPii = "completely different content about databases engines queries plans " +
      "optimizers shuffles partitions executors drivers caching storage formats " +
      "reach me at ops.lead@example.org or 10.1.2.3 for more details today"
    val docs = Seq((1L, withPii))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val (cleaned, stats) = CleanCorpus.clean(docs)
    assert(stats.afterNearDup == 1)
    val text = cleaned.select("text").collect().head.getString(0)
    assert(text.contains("<EMAIL>") && text.contains("<IP>"))
    assert(!text.contains("example.org") && !text.contains("10.1.2.3"))
  }

  test("repetition gate drops degenerate repeated-content documents") {
    import spark.implicits._
    val good = "completely different content about databases engines queries plans " +
      "optimizers shuffles partitions executors drivers caching storage formats " +
      "and various other technical topics worth keeping around"
    // 30 tokens of the same word: top_tok_share = 1.0, dup 3-grams ≈ 1.0
    val degenerate = Seq.fill(30)("spam").mkString(" ")
    val docs = Seq((1L, good), (2L, degenerate))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val (cleaned, stats) = CleanCorpus.clean(docs)
    assert(stats.afterQuality == 1)
    assert(cleaned.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("decontamination stage drops docs overlapping the eval set") {
    import spark.implicits._
    val evalText = "the quick brown fox jumps over a lazy dog and then runs far away " +
      "to find more interesting words for this synthetic document corpus today"
    val cleanText = "completely different content about databases engines queries plans " +
      "optimizers shuffles partitions executors drivers caching storage formats " +
      "and various other technical topics worth keeping around"
    val docs = Seq(
      (1L, evalText + " slightly changed"), // leaks the eval doc
      (2L, cleanText)
    ).map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")

    val (cleaned, stats) = CleanCorpus.clean(docs, jaccardThreshold = 0.9,
      evalDocs = Some(evalSet), maxEvalOverlap = 0.5)
    val kept = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stats.afterQuality == 2)
    assert(stats.afterDecontam == 1) // doc 1 leaks the benchmark
    assert(kept == Set(2L))
  }

  test("boilerplate stage collapses chrome-only near-dups into exact dups before dedup") {
    import spark.implicits._
    // Two 5-token banners, each leading 3 docs (df = 3 = minDf →
    // boilerplate). Docs 1 and 2 share a body under DIFFERENT banners:
    // near-dups before the strip, byte-equal after it — so the cheap
    // exact-hash stage catches what would otherwise need LSH.
    val banner1 = "subscribe via our newsletter today"
    val banner2 = "copyright notice twenty twenty five"
    val body = "completely different content about databases engines queries plans " +
      "optimizers shuffles partitions executors drivers caching storage formats " +
      "various other technical topics worth keeping around"
    val others = Seq(
      "unrelated article discussing entirely separate material concerning gardening " +
        "weather patterns cooking recipes travel destinations hobbies music instruments " +
        "painting techniques sculpture history literature poetry",
      "quarterly financial overview covering revenue margins expenses forecasts " +
        "budgets headcount growth initiatives partnerships acquisitions regional " +
        "performance currency impacts guidance adjustments outlook commentary",
      "scientific report summarizing experiments measurements instruments calibration " +
        "samples observations hypotheses conclusions methodology statistics variance " +
        "uncertainty replication peer review publication process notes",
      "sports recap describing matches scores players transfers injuries standings " +
        "tournaments qualifiers finals champions records statistics highlights " +
        "interviews coaching tactics formations substitutions attendance")
    val docs = Seq(
      (1L, s"$banner1 $body"),
      (2L, s"$banner2 $body"),     // same body, different chrome
      (3L, s"$banner1 ${others(0)}"),
      (4L, s"$banner2 ${others(1)}"),
      (5L, s"$banner1 ${others(2)}"),
      (6L, s"$banner2 ${others(3)}")
    ).map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")

    val (cleaned, stats) = CleanCorpus.clean(docs, jaccardThreshold = 0.9,
      boilerplateMinDf = Some(3), boilerplateSegTokens = 5)
    assert(stats.afterQuality == 6)
    assert(stats.afterBoilerplate == 6) // stripped, none emptied
    assert(stats.afterExact == 5)       // 2 became an exact dup of 1
    assert(stats.afterNearDup == 5)     // nothing left for LSH to find
    val kept = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
    // both banners are gone from every surviving text
    val texts = cleaned.select("text").collect().map(_.getString(0))
    assert(texts.forall(t => !t.contains("subscribe") && !t.contains("copyright")))
  }

  test("model gate: a rule-distilled model agrees with the rules it was trained on") {
    import spark.implicits._
    val prose = (1 to 10).map(i =>
      s"document number$i discusses distributed query engines covering " +
        s"partition pruning shuffle boundaries broadcast joins codegen stages " +
        s"columnar scans predicate pushdown adaptive execution topic$i metrics " +
        s"latency throughput resource scheduling memory spill management")
    val junk = (11 to 20).map(i => Seq.fill(25)(s"spam$i").mkString(" "))
    val docs = (prose ++ junk).zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val model = QualityClassifier.distillFromRules(docs)
    val (_, stats) = CleanCorpus.clean(docs, jaccardThreshold = 0.9,
      qualityModel = Some((model, 0.5)))
    // rules drop the 10 junk docs; on this cleanly separable corpus the
    // distilled model agrees with the rules and drops nothing further
    assert(stats.afterQuality == 10)
    assert(stats.afterModel == 10)
    assert(stats.afterNearDup == 10)
    // an impossible threshold shows the gate actually bites
    val (_, hard) = CleanCorpus.clean(docs, jaccardThreshold = 0.9,
      qualityModel = Some((model, 1.01)))
    assert(hard.afterQuality == 10 && hard.afterModel == 0 && hard.afterNearDup == 0)
  }

  test("normalize stage makes composed and decomposed accents exact dups") {
    import spark.implicits._
    // same text, composed é (U+00E9) vs decomposed e+U+0301 — different
    // bytes, canonically equal
    val composed = "résumé writing advice covering layout headings achievements " +
      "metrics keywords formatting length tailoring proofreading references " +
      "summary skills experience education certifications contact details"
    val decomposed = java.text.Normalizer.normalize(
      composed, java.text.Normalizer.Form.NFD)
    assert(composed != decomposed)
    val docs = Seq((1L, composed), (2L, decomposed))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val (_, raw) = CleanCorpus.clean(docs, jaccardThreshold = 0.99)
    assert(raw.afterExact == 2) // bytes differ → exact dedup misses them
    val (cleaned, norm) = CleanCorpus.clean(docs, jaccardThreshold = 0.99,
      normalize = true)
    assert(norm.afterExact == 1) // normalized → the hash catches the dup
    assert(cleaned.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("intra-doc stage collapses in-doc stutter so twins dedup exactly") {
    import spark.implicits._
    // 26 tokens (even) so the repeated chunk aligns on 2-token chunk
    // boundaries; its first chunk IS "spark shuffles".
    val base = "spark shuffles partition data across executors during wide " +
      "transformations and the scheduler assigns tasks to cores respecting " +
      "locality while the optimizer prunes columns and pushes filters"
    assert(base.split(' ').length == 26)
    // doc 2 repeats doc 1's first chunk 30 times — without the intra-doc
    // pass it fails the repetition gate; with it, it reduces to exactly
    // doc 1's text and exact dedup folds the pair.
    val stutter = base + " " + Array.fill(30)("spark shuffles").mkString(" ")
    val docs = Seq((1L, base), (2L, stutter))
      .map { case (id, t) => (id, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val (_, raw) = CleanCorpus.clean(docs, jaccardThreshold = 0.99)
    val (cleaned, intra) = CleanCorpus.clean(docs, jaccardThreshold = 0.99,
      intraDocSegTokens = Some(2))
    assert(raw.afterQuality == 1, s"raw=$raw")   // stutter doc gate-killed
    assert(intra.afterQuality == 2, s"intra=$intra") // survives cleaned
    assert(intra.afterExact == 1)                // ...then folds into doc 1
    assert(cleaned.count() == 1)
  }

  test("pipeline on the real corpus reduces it monotonically") {
    val docs = graft.sources.Tables.documents(spark, sfDirMid)
    val (_, stats) = CleanCorpus.clean(docs, jaccardThreshold = 0.8)
    assert(stats.input == 500)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExact <= stats.afterQuality)
    assert(stats.afterNearDup < stats.afterExact) // planted near-dups exist
    assert(stats.afterNearDup > 400) // but most of the corpus survives
  }
}
