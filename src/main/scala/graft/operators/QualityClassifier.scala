package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of an LLM data
  * pipeline (the fastText/CCNet-style filter): train a logistic
  * regression over cheap per-document signals, then keep documents the
  * model scores above a threshold.
  *
  * Built Spark-first in two deliberately different halves:
  *
  *   - TRAINING uses MLlib's distributed `LogisticRegression` over a
  *     label + feature frame (iterative L-BFGS; runs rarely, on a
  *     sample or a labeled seed set).
  *   - SCORING throws MLlib away: the fitted model is six doubles, so
  *     [[scoreExpr]] folds them into one `sigmoid(intercept + w·x)`
  *     Column — whole-stage-codegen arithmetic, zero shuffles, no
  *     model object on the executors. At 100 TB the filter is a single
  *     map over the corpus.
  *
  * Every feature in [[featuresOf]] is row-local (higher-order array
  * functions, no explode/groupBy), so featurize+score is ONE projection
  * on the scan — unlike the report-oriented quality queries (q27/q51)
  * that are free to shuffle.
  */
object QualityClassifier {

  /** Fitted model: parallel arrays of feature column names and weights. */
  final case class Model(featureNames: Seq[String], coefficients: Seq[Double],
      intercept: Double) {
    require(featureNames.length == coefficients.length,
      s"${featureNames.length} names vs ${coefficients.length} coefficients")
  }

  val FeatureCols: Seq[String] = Seq(
    "f_log_tokens", "f_stop_ratio", "f_mean_word_len",
    "f_dup_3gram_share", "f_top_tok_share", "f_nonword_ratio")

  // the document-frequency stopword set of the rule-based gate
  // (TextAnalysis.stopwords) — kept in sync by QualityClassifierSpec
  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document quality signals as one shuffle-free projection.
    * Input needs (doc_id, text); output adds the [[FeatureCols]].
    * Null/empty texts get all-zero features (scored, not dropped — the
    * caller's threshold decides their fate; zero features ≈ the worst
    * junk profile, which is what an empty document is).
    */
  def featuresOf(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val nTok = size(toks)
    val n3 = greatest(nTok - 2, lit(0))
    // distinct 3-gram share without an explode: build the per-row
    // 3-gram array, count distinct entries in place
    val grams = transform(sequence(lit(0), n3 - 1),
      i => array_join(slice(toks, i + 1, lit(3)), " "))
    val dupShare = when(n3 > 0,
      (n3 - size(array_distinct(grams))).cast("double") / n3).otherwise(lit(0.0))
    // max token multiplicity without a groupBy: longest run in the
    // sorted token array, folded with aggregate()
    val maxRun = aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val stops = stopwords.map(w => size(filter(toks, t => t === w)))
      .reduce(_ + _)
    val lowered = lower(col("text"))
    val nonword = length(lowered) - length(regexp_replace(lowered, "[^a-z ]", ""))
    // split("", " ") is [""], so size > 0 alone passes blank texts
    val guard = col("text").isNotNull && length(trim(col("text"))) > 0
    docs
      .withColumn("f_log_tokens",
        when(guard, log1p(nTok.cast("double"))).otherwise(lit(0.0)))
      .withColumn("f_stop_ratio",
        when(guard, stops.cast("double") / nTok).otherwise(lit(0.0)))
      .withColumn("f_mean_word_len",
        when(guard, (length(col("text")) - (nTok - 1)).cast("double") / nTok)
          .otherwise(lit(0.0)))
      .withColumn("f_dup_3gram_share", when(guard, dupShare).otherwise(lit(0.0)))
      .withColumn("f_top_tok_share",
        when(guard, maxRun.cast("double") / nTok).otherwise(lit(0.0)))
      .withColumn("f_nonword_ratio",
        when(guard && length(col("text")) > 0,
          nonword.cast("double") / length(col("text"))).otherwise(lit(0.0)))
  }

  /** Train on a frame that has the [[FeatureCols]] plus `labelCol`
    * (1.0 = quality, 0.0 = junk). Distributed L-BFGS; the result is
    * just the weight vector.
    */
  def train(featured: DataFrame, labelCol: String = "label",
      maxIter: Int = 100, regParam: Double = 1e-3): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("__features")
      .transform(featured.withColumn("__label", col(labelCol).cast("double")))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
    val fitted = lr.fit(assembled)
    Model(FeatureCols, fitted.coefficients.toArray.toSeq, fitted.intercept)
  }

  /** The pre-sigmoid linear score z = intercept + w·x, folded
    * left-to-right in [[FeatureCols]] order (the order matters for
    * bit-reproducibility of the sum — the oracle mirrors it). */
  def linearExpr(model: Model): Column =
    model.featureNames.zip(model.coefficients)
      .foldLeft(lit(model.intercept)) { case (acc, (name, w)) =>
        acc + col(name) * lit(w)
      }

  /** The scoring expression: sigmoid(intercept + w·x) over the feature
    * columns — plain codegen'd arithmetic, no MLlib on the hot path.
    */
  def scoreExpr(model: Model): Column =
    lit(1.0) / (lit(1.0) + exp(-linearExpr(model)))

  /** Featurize + score: adds `quality_prob` to `docs`. One projection. */
  def score(docs: DataFrame, model: Model): DataFrame =
    featuresOf(docs).withColumn("quality_prob", scoreExpr(model))
      .drop(FeatureCols: _*)

  /** Keep documents the model scores at or above `threshold`. */
  def filterByModel(docs: DataFrame, model: Model, threshold: Double): DataFrame =
    score(docs, model).where(col("quality_prob") >= threshold)
      .drop("quality_prob")

  // Distilled models are train-once / score-many, like the persistent
  // vector indexes: the fitted weights are cached per (corpus plan,
  // sample rate) so repeated scoring queries don't re-run L-BFGS.
  private val modelCache =
    new graft.util.PlanCache[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Double), Model](
      maxEntries = 4, onEvict = _ => ())

  /** Distill the rule-based gates into a model: weak labels from the
    * q27 quality gate AND the repetition gate (the CleanCorpus stage-1
    * predicate), trained on a deterministic md5 sample of the corpus.
    * The model then scores documents the rules never saw and produces
    * a graded signal where the rules are binary — the standard
    * heuristic-distillation recipe for quality classifiers.
    */
  def distillFromRules(docs: DataFrame, sampleRate: Double = 1.0): Model =
    modelCache.getOrElseUpdate(
      (docs.queryExecution.analyzed.canonicalized, sampleRate))(
      distillUncached(docs, sampleRate))

  private def distillUncached(docs: DataFrame, sampleRate: Double): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ruleKeep = TextAnalysis.qualityScoreOf(docs).where($"keep").select($"doc_id")
    val repetitionKeep = TextAnalysis.repetitionMetricsOf(docs)
      .where($"dup_3gram_share" <= CleanCorpus.MaxDup3gramShare &&
        $"top_tok_share" <= CleanCorpus.MaxTopTokenShare)
      .select($"doc_id")
    val labeled = docs
      .join(ruleKeep.withColumn("__q", lit(1)), Seq("doc_id"), "left")
      .join(repetitionKeep.withColumn("__r", lit(1)), Seq("doc_id"), "left")
      .withColumn("label",
        when($"__q".isNotNull && $"__r".isNotNull, 1.0).otherwise(0.0))
      .drop("__q", "__r")
    val sampled =
      if (sampleRate >= 1.0) labeled
      else Sampling.sample(labeled, col("doc_id"), sampleRate)
    train(featuresOf(sampled))
  }

  /** q99: distill the rule gates on the corpus, score every document,
    * report per-source model acceptance (docs, kept). "Kept" is the
    * LINEAR decision z ≥ 0 — identical to quality_prob ≥ 0.5 (sigmoid
    * is monotone with sigmoid(0) = 0.5) but free of the cross-engine
    * `exp` rounding that would make the boundary engine-dependent.
    * L-BFGS training isn't SQL-expressible, but scoring against the
    * FITTED weights is: [[q99OracleSql]] replays the six row-local
    * features and the linear decision in DuckDB against the recorded
    * weight literals (the q73 dynamic-oracle pattern applied to model
    * scoring). Output columns are counts only — no floats are hashed.
    */
  def q99QualityModel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, d)
    val model = distillFromRules(docs)
    recordedModel = Some(model)
    featuresOf(docs)
      .withColumn("__z", linearExpr(model))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"__z" >= 0.0, 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"source")
  }

  /** Model fitted by the last [[q99QualityModel]] run in this JVM — the
    * Verify flow runs every query before dumping oracle SQL, so the
    * weight literals line up with the dumped parquet. */
  @volatile private var recordedModel: Option[Model] = None

  /** q99's dynamic oracle: replay [[featuresOf]] (tokenization, stopword
    * ratio, per-row distinct 3-gram share, max token multiplicity,
    * non-word ratio) and the z ≥ 0 linear decision in DuckDB. Feature
    * values match the engine's to within ulps (same IEEE divides, same
    * left-to-right weighted sum; log1p vs ln(1+n) on exact integer
    * inputs differ ≤ 1 ulp), and the decision margin |z| is orders of
    * magnitude wider — QualityClassifierSpec pins the empirical margin. */
  def q99OracleSql: Option[String] = recordedModel.map { m =>
    val Seq(wLog, wStop, wMwl, wDup, wTop, wNon) = m.coefficients
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, source, text,
       |         string_split(lower(text), ' ') AS tk,
       |         len(string_split(lower(text), ' ')) AS n_tok,
       |         (text IS NOT NULL AND len(trim(text)) > 0) AS ok
       |  FROM documents
       |), runs AS (
       |  SELECT doc_id, max(c) AS max_run FROM (
       |    SELECT t.doc_id, u.tok, count(*) AS c
       |    FROM toks t, unnest(t.tk) AS u(tok)
       |    GROUP BY t.doc_id, u.tok)
       |  GROUP BY doc_id
       |), feats AS (
       |  SELECT t.source,
       |    CASE WHEN ok THEN ln(1 + n_tok) ELSE 0.0 END AS f_log_tokens,
       |    CASE WHEN ok THEN len(list_filter(tk, x -> x IN ($stopList)))
       |                      / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS f_stop_ratio,
       |    CASE WHEN ok THEN (length(text) - (n_tok - 1))
       |                      / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS f_mean_word_len,
       |    CASE WHEN ok AND n_tok > 2 THEN
       |      (n_tok - 2 - len(list_distinct(list_transform(range(1, n_tok - 1),
       |         i -> array_to_string(tk[i:i+2], ' ')))))
       |      / CAST(n_tok - 2 AS DOUBLE) ELSE 0.0 END AS f_dup_3gram_share,
       |    CASE WHEN ok THEN r.max_run / CAST(n_tok AS DOUBLE)
       |         ELSE 0.0 END AS f_top_tok_share,
       |    CASE WHEN ok AND length(text) > 0 THEN
       |      (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z ]', '', 'g')))
       |      / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS f_nonword_ratio
       |  FROM toks t LEFT JOIN runs r USING (doc_id)
       |)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN ${m.intercept}
       |                          + f_log_tokens * $wLog
       |                          + f_stop_ratio * $wStop
       |                          + f_mean_word_len * $wMwl
       |                          + f_dup_3gram_share * $wDup
       |                          + f_top_tok_share * $wTop
       |                          + f_nonword_ratio * $wNon >= 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM feats GROUP BY source ORDER BY source""".stripMargin
  }
}
