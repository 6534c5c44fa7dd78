package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity, TextAnalysis, SpanDedup}

/** Training-data pipeline query surface: dedup family, similarity
  * search, text analysis. Thin wiring over the operators in
  * `graft.operators`; thresholds fixed here so the DuckDB oracles are
  * reproducible.
  */
object TrainingData {

  // -- dedup family ---------------------------------------------------

  def q20DedupExact(spark: SparkSession, d: String): DataFrame =
    Dedup.exact(spark, d)
  val q20Sql: String = Dedup.exactSql

  def q21NgramJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccard(spark, d, threshold = 0.6)
  val q21Sql: String = Dedup.ngramJaccardSql(0.6)

  /** LSH candidates verified with exact Jaccard → equals brute force
    * (whp; band catch probability 1-1e-14 at j=0.8), so the brute-force
    * SQL is a valid oracle. */
  def q22MinhashLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.minhashLsh(spark, d, threshold = 0.8)
  val q22Sql: String = Dedup.ngramJaccardSql(0.8)

  /** SimHash pairs over the portable 60-bit signature — the DuckDB
    * oracle replays the hash and bit votes exactly. */
  def q23SimhashPairs(spark: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(spark, d, maxHamming = 7)
  val q23Sql: String = Dedup.simhashPairsSql(7)

  /** Registered through the IVF-blocked path — no full-corpus driver
    * collect in the plan. Precision is exact (candidates verified with
    * the codegen'd cosine); 16 lists × 8 probes is empirically
    * exhaustive on this corpus (recall 920/920 at sf0.1, DedupSpec +
    * the all-pairs DuckDB oracle), so the uncapped SQL still
    * hash-matches. Production sizing is nLists ≈ √n with 2–4 probes,
    * trading bounded recall for candidate volume — threshold 0.4 is a
    * dense pair graph, and exhaustive recall at ANY corpus size costs
    * near-quadratic candidates no matter the blocking. */
  def q24EmbeddingNearDup(spark: SparkSession, d: String): DataFrame = {
    // Exhaustive 16x8 only while the corpus is small enough that its
    // near-quadratic candidate volume is cheaper than a recall tradeoff
    // (test SFs, where the all-pairs oracle demands 100% recall); above
    // the cutoff the auto-sized IVF (nLists ~ sqrt(n), probes from the
    // recall target) takes over — the 10x scale probe measured the
    // pinned config at 14x cost for 10x data, the auto path ~linear.
    // n comes from the parquet footers (driver-side metadata), not a
    // count() job: the config choice must not cost a table scan.
    val n = graft.sources.Tables.rowCount(spark, d, "embeddings")
    if (n <= 4096)
      Dedup.embeddingNearDupIvf(spark, d, threshold = 0.4,
        nCentroids = 16, nAssign = 8)
    else Dedup.embeddingNearDupIvf(spark, d, threshold = 0.4)
  }
  val q24Sql: String = Dedup.embeddingNearDupSql(0.4)

  /** Dedup keeper selection: transitive near-dup clusters via
    * connected components; oracle is a DuckDB recursive CTE over the
    * same pair graph. */
  def q40DedupClusters(spark: SparkSession, d: String): DataFrame =
    Dedup.nearDupClusters(spark, d, threshold = 0.4)
  val q40Sql: String = Dedup.nearDupClustersSql(0.4)

  /** Production text near-dup clustering: CC over MinHash-LSH verified
    * candidates (bucketed end to end); oracle is the brute-force
    * Jaccard closure, which the LSH path equals whp. */
  def q47DedupClustersLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.nearDupClustersLsh(spark, d, threshold = 0.6)
  val q47Sql: String = Dedup.nearDupClustersLshSql(0.6)

  /** Source-priority keeper selection: duplicates keep the
    * most-curated source's copy, not the lowest id. */
  def q92DedupPriority(spark: SparkSession, d: String): DataFrame =
    Dedup.exactPriority(spark, d)
  val q92Sql: String = Dedup.exactPrioritySql

  /** Corpus-wide boilerplate removal: segments in ≥3 distinct docs
    * dropped everywhere (vs q69's first-occurrence-wins). */
  def q96Boilerplate(spark: SparkSession, d: String): DataFrame =
    Dedup.q96Boilerplate(spark, d)
  val q96Sql: String = Dedup.q96Sql

  /** Cross-source near-dup matrix over the q47 LSH edge list. */
  def q97SourceOverlap(spark: SparkSession, d: String): DataFrame =
    Dedup.q97SourceOverlap(spark, d)
  val q97Sql: String = Dedup.sourceOverlapSql(0.6)

  /** Bigram association by lift (exact-integer single-division). */
  def q98BigramLift(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.bigramLift(spark, d, n = 20, minCount = 5)
  val q98Sql: String = TextAnalysis.bigramLiftSql(20, 5)

  // -- similarity search ----------------------------------------------

  def q25AnnTopK(spark: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(spark, d, k = 5, nQueries = 10)
  val q25Sql: String = Similarity.bruteForceTopKSql(5, 10)

  /** Approximate LSH variant — rows-only; recall asserted in
    * SimilaritySpec. */
  def q26AnnLsh(spark: SparkSession, d: String): DataFrame =
    Similarity.annLsh(spark, d, k = 5, nQueries = 10)

  /** IVF-bucketed ANN (the preferred scale path) — rows-only; recall
    * asserted in SimilaritySpec. */
  def q31AnnIvf(spark: SparkSession, d: String): DataFrame =
    Similarity.annIvf(spark, d, k = 5, nQueries = 10)

  /** Hard-negative mining: per anchor, top-k nearest with a different
    * label (exact; IVF production variant spec-checked for recall). */
  def q100HardNegatives(spark: SparkSession, d: String): DataFrame =
    Similarity.hardNegatives(spark, d, k = 5, nAnchors = 10)
  val q100Sql: String = Similarity.hardNegativesSql(5, 10)

  // -- text analysis ---------------------------------------------------

  def q27TokenStats(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenStats(spark, d)
  val q27Sql: String = TextAnalysis.tokenStatsSql

  def q28Quality(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScore(spark, d)
  val q28Sql: String = TextAnalysis.qualityScoreSql

  def q29LangId(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.langId(spark, d)
  val q29Sql: String = TextAnalysis.langIdSql

  /** Winnowing fingerprints — portable polynomial k-gram hash, so the
    * whole winnowing pass (hash, sliding min, distinct set) is
    * oracle-exact. */
  def q30Fingerprint(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprint(spark, d)

  val q30Sql: String = TextAnalysis.fingerprintSql(4, 5)

  // -- sub-document duplication ----------------------------------------

  /** Duplicated-span coverage (Lee et al. exact-substring signal):
    * per doc, tokens inside a 5-gram that recurs corpus-wide. */
  def q102DupSpans(spark: SparkSession, d: String): DataFrame =
    SpanDedup.dupSpanCoverage(spark, d, k = 5, minCount = 2)
  val q102Sql: String = SpanDedup.dupSpanCoverageSql(5, 2)

  /** Within-document segment dedup — zero-shuffle first-occurrence-wins
    * over 2-token chunks. */
  def q103IntraDocDedup(spark: SparkSession, d: String): DataFrame =
    SpanDedup.dedupSegmentsIntraDoc(spark, d, segTokens = 2)
  val q103Sql: String = SpanDedup.dedupSegmentsIntraDocSql(2)

  /** Corpus-relative bigram familiarity buckets (CCNet-style quality
    * signal, integer-exact formulation). */
  def q104Familiarity(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.bigramFamiliarity(spark, d)
  val q104Sql: String = TextAnalysis.bigramFamiliaritySql
}
