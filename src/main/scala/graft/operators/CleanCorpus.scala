package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus cleaning pipeline — the operator a
  * data-curation user actually calls: (optional) Unicode cleanup →
  * rule quality filter → (optional)
  * model quality gate → (optional) corpus-frequency boilerplate strip →
  * decontamination → exact dedup → near-dup dedup (MinHash LSH +
  * connected components, keeper = min id) → PII scrub → the kept corpus
  * plus per-stage attrition stats.
  *
  * Every stage is a DataFrame transform: quality is a projection
  * filter, exact dedup one shuffle on the content hash, near-dup the
  * LSH candidate path with exact verification, redaction a scan-side
  * regexp chain — the same plan at any scale.
  */
object CleanCorpus {

  /** Scan-side text preparation shared by the batch pipeline (stages
    * 0/0b) and the streaming ingest front door: optional Unicode NFC
    * cleanup, optional within-document segment dedup. Both are pure
    * projections — zero shuffles — so they compose into a streaming
    * micro-batch unchanged. Any stage that rewrites text re-derives
    * n_chars: the quality gate computes mean word length from it, and
    * a stale count would score the OLD text against the NEW tokens. */
  def prepare(docs: DataFrame, normalize: Boolean,
      intraDocSegTokens: Option[Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def refreshChars(df: DataFrame): DataFrame =
      if (df.columns.contains("n_chars"))
        df.withColumn("n_chars", length($"text").cast("long"))
      else df
    val docsN =
      if (!normalize) docs
      else {
        graft.functions.NormalizeNfc.register(spark)
        refreshChars(docs.withColumn("text", TextAnalysis.cleanText($"text")))
      }
    // within-document segment dedup: in-doc stutter collapses BEFORE
    // quality metrics score it and before any dedup key forms, so a
    // page repeating one paragraph 50× neither fails the repetition
    // gate spuriously nor hashes unlike its single-copy twin. Inlined
    // as a projection (the same array_distinct rewrite as
    // [[SpanDedup.dedupSegmentsIntraDocOf]]) rather than a join back,
    // keeping the whole prepare pass shuffle-free.
    intraDocSegTokens match {
      case None => docsN
      case Some(seg) =>
        refreshChars(docsN
          .withColumn("__toks", split(lower($"text"), " "))
          .withColumn("text",
            when($"text".isNotNull && size($"__toks") > 0, array_join(
              array_distinct(expr(
                s"""transform(sequence(0, cast(ceil(size(__toks) / ${seg}d) as int) - 1),
                   |  i -> array_join(slice(__toks, i * $seg + 1, $seg), ' '))""".stripMargin)),
              " ")).otherwise($"text"))
          .drop("__toks"))
    }
  }

  final case class Stats(
      input: Long, afterQuality: Long, afterModel: Long, afterBoilerplate: Long,
      afterDecontam: Long, afterExact: Long, afterNearDup: Long)

  /** Repetition gate defaults (the Gopher-rule thresholds family):
    * drop documents whose duplicate word-3-gram share or single-token
    * concentration signals degenerate repetition. */
  val MaxDup3gramShare = 0.75
  val MaxTopTokenShare = 0.30

  /** Clean `docs` (doc_id, text, lang, n_chars …); returns the kept
    * corpus and attrition counts. `evalDocs` (a benchmark set) enables
    * the decontamination stage — documents whose shingles overlap the
    * eval set at ≥ `maxEvalOverlap` are dropped before dedup. The
    * quality gate combines the length/stopword scoring with the
    * repetition metrics (both reuse the shared shingle index). */
  def clean(docs: DataFrame, jaccardThreshold: Double = 0.8,
      evalDocs: Option[DataFrame] = None,
      maxEvalOverlap: Double = 0.5,
      boilerplateMinDf: Option[Int] = None,
      boilerplateSegTokens: Int = 16,
      qualityModel: Option[(QualityClassifier.Model, Double)] = None,
      normalize: Boolean = false,
      intraDocSegTokens: Option[Int] = None): (DataFrame, Stats) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val input = docs.count()

    // 0. Unicode cleanup (no attrition — a pure scan-side rewrite):
    // canonically-equal texts must hash equal before any dedup key is
    // computed, or composed/decomposed variants slip past every stage.
    val docs0 = prepare(docs, normalize, intraDocSegTokens)

    // 1. quality gate: scoring rules + repetition rules
    val keepIds = TextAnalysis.qualityScoreOf(docs0)
      .where($"keep").select($"doc_id")
    val repetitionOk = TextAnalysis.repetitionMetricsOf(docs0)
      .where($"dup_3gram_share" <= MaxDup3gramShare &&
        $"top_tok_share" <= MaxTopTokenShare)
      .select($"doc_id")
    val quality2 = docs0.join(keepIds, "doc_id")
      .join(repetitionOk, "doc_id").cache()
    val nQuality = quality2.count()

    // 1a'. model gate: graded second opinion after the binary rules —
    // a shuffle-free scored filter (the 100 TB path is one projection).
    val quality1 = qualityModel match {
      case Some((model, threshold)) =>
        QualityClassifier.filterByModel(quality2, model, threshold).cache()
      case None => quality2
    }
    val nModel = if (qualityModel.isDefined) quality1.count() else nQuality

    // 1a. corpus-frequency boilerplate strip (C4-style, before dedup so
    // near-dups that differ only in chrome collapse to exact dups;
    // before decontamination so shared chrome can't fake eval overlap).
    val quality0 = boilerplateMinDf match {
      case Some(minDf) =>
        Dedup.stripBoilerplate(quality1, boilerplateSegTokens, minDf).cache()
      case None => quality1
    }
    val nBoilerplate = if (boilerplateMinDf.isDefined) quality0.count() else nModel

    // 1b. benchmark decontamination (leakage guard), when an eval set
    // is supplied.
    val quality = evalDocs match {
      case Some(ev) => Decontaminate.decontaminate(quality0, ev, maxEvalOverlap).cache()
      case None => quality0
    }
    // without an eval set the stage is a no-op — reuse the count
    val nDecontam = if (evalDocs.isDefined) quality.count() else nBoilerplate

    // 2. exact dedup: keep min doc_id per full-text hash
    val exactKeepers = quality
      .withColumn("key", md5(concat_ws(" ", graft.functions.TextFunctions.tokens($"text"))))
      .groupBy($"key").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val exact = quality.join(exactKeepers, "doc_id").cache()
    val nExact = exact.count()

    // 3. near-dup dedup: LSH pairs → components → drop non-keepers
    val pairs = Dedup.minhashLshOf(exact, jaccardThreshold)
    val dropIds = Dedup.connectedComponents(pairs)
      .where($"id" =!= $"label") // keeper = component min id stays
      .select($"id".as("doc_id"))
    // 4. PII scrub on the surviving text — last, so the regexp chain
    // runs over the fewest rows (kept-only) and dedup keys were
    // computed on the raw text.
    val cleaned = exact.join(dropIds, Seq("doc_id"), "left_anti")
      .withColumn("text", Redact.scrub($"text"))
    val nFinal = cleaned.count()

    // Stage caches served their multiple readers; only `exact` — the
    // returned frame's parent — stays cached (caller unpersists when
    // done with the cleaned corpus).
    quality2.unpersist()
    if (qualityModel.isDefined) quality1.unpersist()
    if (boilerplateMinDf.isDefined) quality0.unpersist()
    if (evalDocs.isDefined) quality.unpersist()

    (cleaned, Stats(input, nQuality, nModel, nBoilerplate, nDecontam, nExact, nFinal))
  }
}
