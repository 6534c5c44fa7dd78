package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based sampling (`df.sample`) is partition-order dependent and
  * engine-specific — a re-run, a repartition, or a different engine
  * draws a different sample. Pipelines that need reproducible corpus
  * subsets (ablations, decontamination splits, per-language quotas)
  * sample on a *hash of a stable key* instead: u(doc) = the first 8 hex
  * chars of md5(key), kept iff u < rate. md5 is md5 in every engine, so
  * the exact same rows are selected by Spark and by the DuckDB oracle,
  * at any parallelism, forever.
  *
  * The comparison stays entirely lexicographic on fixed-length lowercase
  * hex, which equals numeric comparison — no 64-bit hex parsing needed,
  * so the predicate is portable SQL and codegen-friendly (one md5 + one
  * substring + one string compare per row, pushed into the scan).
  */
object Sampling {

  /** Rate → 8-hex-char threshold: keep iff hash8 < threshold.
    * rate ≥ 1 uses a sentinel above every hex digit ("g"), rate ≤ 0
    * selects nothing (""). */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) ""
    // cap at 2^32-1: a rate within 2^-33 of 1.0 rounds to 2^32, whose
    // hex is 9 chars and sorts BELOW most 8-char hashes — the
    // fixed-width invariant would silently drop ~94% of rows.
    else f"${math.min((rate * 4294967296.0).round, 0xFFFFFFFFL)}%08x"

  /** The sampling hash: first 8 hex chars of md5 of the key rendered as
    * a string (BIGINT → decimal string in both engines). A NULL key
    * hashes like the empty string — md5(NULL) is NULL, and a NULL
    * comparison would silently drop the row even at rate 1.0. */
  def hash8(key: Column): Column =
    substring(md5(coalesce(key.cast("string"), lit(""))), 1, 8)

  /** Uniform deterministic sample at `rate` on a stable key column. */
  def sample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hash8(key) < lit(hexThreshold(rate)))

  /** Stratified sample: per-stratum rates with a default — e.g. keep
    * 50% of English, 20% of everything else. The threshold is a
    * when-chain over the (small, driver-known) rates map, fully
    * codegen'd; rows in no stratum use the default rate. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (value, rate)) => when(stratum === value, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.where(hash8(key) < threshold)
  }

  /** Temperature-based mixture rates (the multilingual-corpus
    * reweighting rule): sampling share of stratum i ∝ p_i^alpha with
    * p_i its corpus share — alpha = 1 keeps natural proportions,
    * alpha = 0 equalizes strata, values between damp the head. Returns
    * per-stratum Bernoulli rates sized so the expected kept total is
    * `budgetDocs`, capped at 1 (a stratum smaller than its allocation
    * is taken whole). Feed the result to [[stratified]]. */
  def temperatureRates(counts: Map[String, Long], alpha: Double,
      budgetDocs: Long): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0), "counts must be positive")
    val total = counts.values.sum.toDouble
    val weights = counts.map { case (k, n) => k -> math.pow(n / total, alpha) }
    val wSum = weights.values.sum
    weights.map { case (k, w) =>
      k -> math.min(1.0, budgetDocs * (w / wSum) / counts(k))
    }
  }

  /** q48: per-(lang, source) counts of a stratified documents sample —
    * 50% of English docs, 20% of the rest, keyed on doc_id. */
  def q48StratifiedSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    stratified(Tables.documents(spark, d), $"doc_id", $"lang",
      Map("en" -> 0.5), defaultRate = 0.2)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_id"),
        max($"doc_id").as("last_id"))
      .orderBy($"lang", $"source")
  }

  /** q64: temperature-resampled corpus mixture — the multilingual /
    * multi-source reweighting pass of a training-data pipeline. Counts
    * per source, [[temperatureRates]] at alpha = 0.5 with a budget of
    * half the corpus (head sources are damped toward the tail), rates
    * rounded to 4 decimals (so the engine and the oracle agree on the
    * threshold regardless of each one's float summation order — a 1e-16
    * ulp wiggle can never cross a 1e-4 grid line), then the same
    * deterministic hash acceptance as q48. Per-source kept counts out.
    *
    * The per-source counts collapse to one tiny aggregate (`sources` is
    * a low-cardinality dimension); the sampling pass itself is a pure
    * scan-side filter — nothing here shuffles the corpus. */
  def q64MixtureSample(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val counts = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val budget = counts.values.sum / 2
    val rates = temperatureRates(counts, alpha = 0.5, budgetDocs = budget)
      .map { case (k, v) => k -> math.round(v * 1e4) / 1e4 }
    stratified(docs, $"doc_id", $"source", rates, defaultRate = 0.0)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_id"),
        max($"doc_id").as("last_id"))
      .orderBy($"source")
  }

  val q64Sql: String =
    """WITH counts AS (
      |  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
      |), tot AS (
      |  SELECT sum(n) AS total, floor(sum(n) / 2) AS budget FROM counts
      |), w AS (
      |  SELECT source, n, pow(n / total, 0.5) AS wt, budget FROM counts, tot
      |), ws AS (
      |  SELECT sum(wt) AS wsum FROM w
      |), thr AS (
      |  SELECT source,
      |         round(least(1.0, budget * (wt / wsum) / n), 4) AS rate4
      |  FROM w, ws
      |), hx AS (
      |  SELECT source,
      |         CASE WHEN rate4 >= 1.0 THEN 'g'
      |              WHEN rate4 <= 0.0 THEN ''
      |              ELSE lpad(lower(to_hex(CAST(round(rate4 * 4294967296.0) AS BIGINT))), 8, '0')
      |         END AS threshold
      |  FROM thr
      |)
      |SELECT d.source, count(*) AS n_docs,
      |       min(d.doc_id) AS first_id, max(d.doc_id) AS last_id
      |FROM documents d JOIN hx h ON d.source = h.source
      |WHERE substring(md5(coalesce(CAST(d.doc_id AS VARCHAR), '')), 1, 8) < h.threshold
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  /** Deterministic train/val/test assignment on a stable key: one md5,
    * two threshold compares — 'train' below `trainRate`, 'val' in the
    * next `valRate` band, 'test' above. The split is a pure row-local
    * function of the key: stable under repartition, engine-portable,
    * and appending new data never reassigns an existing row. */
  def splitAssign(key: Column, trainRate: Double, valRate: Double): Column = {
    val h = hash8(key)
    when(h < lit(hexThreshold(trainRate)), "train")
      .when(h < lit(hexThreshold(trainRate + valRate)), "val")
      .otherwise("test")
  }

  /** q75: per-(lang, split) corpus counts for an 80/10/10 split —
    * the sanity report a pipeline prints before shipping shards. */
  def q75Splits(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .withColumn("split", splitAssign($"doc_id", 0.8, 0.1))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"lang", $"split")
  }

  val q75Sql: String =
    s"""WITH assigned AS (
       |  SELECT lang, n_chars,
       |    CASE WHEN substring(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8) < '${hexThreshold(0.8)}' THEN 'train'
       |         WHEN substring(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8) < '${hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |)
       |SELECT lang, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
       |FROM assigned GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** q124: SPLIT-LEAKAGE audit — near-duplicate document pairs that
    * straddle a train/val/test boundary. A held-out split is only held
    * out if no near-copy of its documents sits in train; this is the
    * check every eval pipeline runs after splitting (the within-corpus
    * complement of external-benchmark decontamination, q49/q94).
    *
    * Rides the verified MinHash-LSH pair frame (the 100 TB dedup path,
    * cached and shared with q22/q47) — the leakage audit is a cheap
    * consumer of the pair index, not a new all-pairs pass. Join to the
    * deterministic split assignment is a broadcast-sized lookup per
    * side. The jaccard ≥ 0.8 threshold is the band configuration q22
    * proves candidate-exhaustive, so the brute-force SQL is a valid
    * oracle here too. */
  def q124SplitLeakage(spark: SparkSession, d: String,
      threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.minhashLsh(spark, d, threshold)
    val splits = Tables.documents(spark, d)
      .select($"doc_id", splitAssign($"doc_id", 0.8, 0.1).as("split"))
    pairs
      .join(splits.select($"doc_id".as("id_a"), $"split".as("split_a")), "id_a")
      .join(splits.select($"doc_id".as("id_b"), $"split".as("split_b")), "id_b")
      .where($"split_a" =!= $"split_b")
      .select($"id_a", $"id_b", $"jaccard", $"split_a", $"split_b")
      .orderBy($"id_a", $"id_b")
  }

  def q124Sql(threshold: Double = 0.8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
       |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
       |), counts AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT id_a, id_b,
       |         CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
       |  FROM inter
       |  JOIN counts ca ON ca.doc_id = id_a
       |  JOIN counts cb ON cb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= $threshold
       |), assigned AS (
       |  SELECT doc_id,
       |    CASE WHEN substring(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8) < '${hexThreshold(0.8)}' THEN 'train'
       |         WHEN substring(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8) < '${hexThreshold(0.9)}' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |)
       |SELECT p.id_a, p.id_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
       |FROM pairs p
       |JOIN assigned sa ON sa.doc_id = p.id_a
       |JOIN assigned sb ON sb.doc_id = p.id_b
       |WHERE sa.split <> sb.split
       |ORDER BY id_a, id_b""".stripMargin

  val q48Sql: String =
    s"""SELECT lang, source, count(*) AS n_docs,
       |       min(doc_id) AS first_id, max(doc_id) AS last_id
       |FROM documents
       |WHERE substring(md5(coalesce(CAST(doc_id AS VARCHAR), '')), 1, 8) <
       |      CASE WHEN lang = 'en' THEN '${hexThreshold(0.5)}' ELSE '${hexThreshold(0.2)}' END
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  /** q93: corpus-mix governance report — per source: docs, language
    * spread, character volume, and corpus share. The dashboard a
    * data-mixture owner watches before a training run; one map-side-
    * combining aggregate over the corpus plus a broadcast of the
    * one-row total. The share divides two exact longs in ONE double
    * division (identical operands in both engines → identical IEEE
    * result), never a float sum. */
  def q93SourceMix(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, d)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lang").as("n_langs"),
        sum($"n_chars").as("total_chars"))
      .withColumn("share", $"n_docs" / sum($"n_docs").over(Window.partitionBy()))
      .orderBy($"source")
  }

  val q93Sql: String =
    """SELECT source, count(*) AS n_docs,
      |       count(DISTINCT lang) AS n_langs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       count(*) / (SELECT count(*) FROM documents) AS share
      |FROM documents GROUP BY 1 ORDER BY source""".stripMargin

  /** EXACT per-source quota: keep at most `cap` documents per source,
    * rank = doc_id ascending (deterministic; swap in a hash rank for an
    * unbiased subset — the shape is identical). This is the governance
    * counterpart of [[q64MixtureSample]]'s rate-based damping: rates
    * give an EXPECTED cap with binomial wiggle and zero shuffles; this
    * gives a HARD cap at the cost of one shuffle partitioned by source.
    * At 100 TB that shuffle is the skew hazard (one mega-source = one
    * hot partition); the mitigation is a pre-filter — rank only within
    * sources whose count exceeds the cap, pass small sources through
    * untouched, so the window shuffle carries only over-cap sources.
    */
  def sourceCapOf(docs: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val withTotal = docs
      .withColumn("__n_total", count(lit(1)).over(Window.partitionBy($"source")))
    val small = withTotal.where($"__n_total" <= cap)
      .select($"doc_id", $"source", $"__n_total")
    val capped = withTotal.where($"__n_total" > cap)
      .withColumn("__rk", row_number().over(
        Window.partitionBy($"source").orderBy($"doc_id")))
      .where($"__rk" <= cap)
      .select($"doc_id", $"source", $"__n_total")
    small.unionByName(capped)
      .groupBy($"source")
      .agg(first($"__n_total").as("n_total"), count(lit(1)).as("n_kept"),
        min($"doc_id").as("first_kept"), max($"doc_id").as("last_kept"))
      .orderBy($"source")
  }

  def q105SourceCap(spark: SparkSession, d: String): DataFrame =
    sourceCapOf(Tables.documents(spark, d), cap = 40)

  val q105Sql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |         count(*) OVER (PARTITION BY source) AS n_total,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      |  FROM documents
      |)
      |SELECT source, min(n_total) AS n_total, count(*) AS n_kept,
      |       min(doc_id) AS first_kept, max(doc_id) AS last_kept
      |FROM ranked WHERE rk <= 40
      |GROUP BY 1 ORDER BY source""".stripMargin

  /** Curriculum phase assignment: order the corpus by an integer
    * difficulty proxy (token count — short documents first) with doc_id
    * as the total-order tie-break, and cut it into `phases` equal ntile
    * buckets. All-integer (ntile boundaries are the SQL-standard
    * bucket-size-differs-by-at-most-one rule on an identical total
    * order), so the oracle matches exactly.
    *
    * Scale note: ntile over a single global window is a one-partition
    * sort — fine for a per-phase MANIFEST (row per doc is the output
    * contract here), but at 100 TB assign phases by pre-computed score
    * quantiles (`approxQuantile` cutoffs broadcast as a CASE) instead
    * of a global window; same output modulo boundary ties. */
  def curriculumOf(docs: DataFrame, phases: Int): DataFrame = {
    require(phases > 0, s"phases must be positive, got $phases")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    docs.where($"text".isNotNull)
      .select($"doc_id",
        size(split(lower($"text"), " ")).cast("long").as("n_tokens"))
      .withColumn("phase", ntile(phases).over(
        Window.orderBy($"n_tokens", $"doc_id")))
      .orderBy($"doc_id")
  }

  def q106Curriculum(spark: SparkSession, d: String): DataFrame =
    curriculumOf(Tables.documents(spark, d), phases = 4)

  /** The 100 TB curriculum path [[curriculumOf]]'s doc prescribes:
    * phase cutoffs from `approxQuantile` (one pass, Greenwald-Khanna,
    * no global window), assignment as a broadcast CASE over the score —
    * a pure scan-side projection. Differs from the exact ntile only at
    * quantile-boundary ties (documents sharing a cutoff score land in
    * the lower phase together instead of splitting by doc_id), which is
    * the honest trade: phase populations wobble by the tied-score mass,
    * order stays monotone in the score. `relativeError = 0` makes the
    * quantiles exact while still never materializing a global sort. */
  def curriculumAtScale(docs: DataFrame, phases: Int,
      relativeError: Double = 0.0): DataFrame = {
    require(phases > 0, s"phases must be positive, got $phases")
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = docs.where($"text".isNotNull)
      .select($"doc_id",
        size(split(lower($"text"), " ")).cast("long").as("n_tokens"))
    val probs = (1 until phases).map(_.toDouble / phases).toArray
    val cuts = scored.stat.approxQuantile("n_tokens", probs, relativeError)
    // Build the CASE smallest-cut-first: fold from the largest cut down
    // so the innermost `when` (evaluated first) is the lowest phase.
    val phase = cuts.zipWithIndex.reverse.foldLeft(lit(phases)) {
      case (acc, (cut, i)) => when($"n_tokens" <= cut, lit(i + 1)).otherwise(acc)
    }
    scored.withColumn("phase", phase).orderBy($"doc_id")
  }

  val q106Sql: String =
    """SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens,
      |       ntile(4) OVER (ORDER BY len(string_split(lower(text), ' ')), doc_id) AS phase
      |FROM documents WHERE text IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  /** Deterministic global training shuffle + sharding: every epoch of a
    * training run needs the corpus in a reproducible pseudo-random
    * order, split into shards that workers read independently. Keyed
    * md5 gives both at once — shard = hash mod nShards (uniform,
    * seed-keyed), pos = rank of the hash WITHIN the shard. Changing the
    * seed re-shuffles; re-running does not.
    *
    * Scale: the hash is a codegen'd projection (no RNG state, no
    * global sort); the only shuffle is the per-shard rank window,
    * whose partitions are corpus/nShards by construction — pick
    * nShards ≥ cluster parallelism and no partition outgrows a task.
    * This is the manifest every epoch reader consumes; a global
    * row_number (single-partition window) is exactly what it avoids. */
  def shuffleShardsOf(docs: DataFrame, seed: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 15 hex digits = 60 bits: fits a positive long exactly, and DuckDB
    // reproduces it with the same md5-hex prefix math.
    val h = conv(substring(md5(
        concat(lit(seed), lit(":"), $"doc_id".cast("string"))), 1, 15), 16, 10)
      .cast("long")
    docs.select($"doc_id")
      .withColumn("h", h)
      .withColumn("shard", ($"h" % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"shard").orderBy($"h", $"doc_id")))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"doc_id")
  }

  def q113ShuffleShards(spark: SparkSession, d: String): DataFrame =
    shuffleShardsOf(Tables.documents(spark, d), seed = "epoch-0", nShards = 8)

  val q113Sql: String =
    """WITH hashed AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5('epoch-0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents
      |)
      |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
      |       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS INT) AS pos
      |FROM hashed ORDER BY doc_id""".stripMargin

  /** Length-bucketed batch assignment — the dynamic-batching pass that
    * keeps padding waste bounded: documents are grouped into coarse
    * length bands (`bandChars`-wide), sorted by exact length inside the
    * band, and chunked into batches of `batchSize`. Padding waste per
    * batch = n·max(len) − Σlen, the tokens a fixed-shape training step
    * would burn on pad; bucketing by band bounds it because batch
    * members differ by at most the band width (plus the band-boundary
    * remainder batch).
    *
    * Scale: the only shuffle keys on the band — bounded cardinality,
    * and the within-band sort is a per-partition window, NEVER a global
    * one-partition sort. A band that outgrows a task splits fine on a
    * salted sub-band ((band, h mod k)) without changing the waste
    * guarantee. Output is batch-level (manifest), corpus-sized / batch. */
  def lengthBatchesOf(docs: DataFrame, bandChars: Int, batchSize: Int): DataFrame = {
    require(bandChars > 0 && batchSize > 0,
      s"bandChars and batchSize must be positive, got $bandChars/$batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    docs.select($"doc_id", $"n_chars")
      .withColumn("band", ($"n_chars" / bandChars).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"band").orderBy($"n_chars", $"doc_id")))
      .withColumn("batch", (($"rk" - 1) / batchSize).cast("long"))
      .groupBy($"band", $"batch")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"),
        (count(lit(1)) * max($"n_chars") - sum($"n_chars")).as("pad_waste"))
      .orderBy($"band", $"batch")
  }

  def q114LengthBatches(spark: SparkSession, d: String): DataFrame =
    lengthBatchesOf(Tables.documents(spark, d), bandChars = 256, batchSize = 16)

  val q114Sql: String =
    """WITH ranked AS (
      |  SELECT doc_id, n_chars, n_chars // 256 AS band,
      |         row_number() OVER (PARTITION BY n_chars // 256
      |                            ORDER BY n_chars, doc_id) AS rk
      |  FROM documents
      |)
      |SELECT band, (rk - 1) // 16 AS batch, count(*) AS n_docs,
      |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |       -- CAST: sum(BIGINT) promotes through HUGEINT in DuckDB, which the
      |       -- driver's pandas bridge renders as float64 (147.0 vs Spark's 147)
      |       CAST(count(*) * max(n_chars) - sum(n_chars) AS BIGINT) AS pad_waste
      |FROM ranked GROUP BY 1, 2 ORDER BY band, batch""".stripMargin

  // --------------------------------------------------------------------
  // q127: token-budget apportionment — the epoch-planning step of a
  // training-data pipeline: given per-source available token counts and
  // integer mixture weights, split a total token budget across sources
  // by LARGEST-REMAINDER apportionment (Hamilton's method: floor shares,
  // then +1 to the largest fractional remainders — the house-seat
  // algorithm), cap each source at its availability, and redistribute
  // the capped shortfall to sources with headroom in one more pass.
  // Everything is integer arithmetic (floors, modular remainders, rank
  // tie-breaks on source name), so the DuckDB oracle replays it exactly.
  //
  // Scale shape: the data-plane cost is ONE partial-agg token count per
  // source (bounded cardinality); the apportionment itself runs on the
  // driver over the source list — a control-plane decision, exactly like
  // q64's temperature rates, and the pure function is unit-testable.
  // --------------------------------------------------------------------

  /** One largest-remainder pass: split `budget` across `items`
    * (name → weight) proportionally to weight, floors first, then +1 to
    * the `budget·w mod W` largest remainders (ties → name ascending).
    * Exact: allocations sum to `budget` whenever budget ≥ 0 and some
    * weight is positive. */
  private[operators] def largestRemainder(items: Seq[(String, Long)],
      budget: Long): Map[String, Long] = {
    val w = items.map(i => BigInt(i._2)).sum
    if (w <= 0 || budget <= 0) return items.map(_._1 -> 0L).toMap
    // BigInt products: since pass 2 weights by HEADROOM, budget·wᵢ is
    // (token count)², which overflows Long at a few GB of text per
    // source — the DuckDB oracle promotes through HUGEINT, so a Long
    // here would silently diverge exactly where the data gets big.
    val b = BigInt(budget)
    val base = items.map { case (n, wi) =>
      (n, b * wi / w, b * wi % w)
    }
    val leftover = (b - base.map(_._2).sum).toLong
    val bump = base.sortBy { case (n, _, rem) => (-rem, n) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (n, bs, _) => n -> (bs.toLong + (if (bump(n)) 1L else 0L)) }.toMap
  }

  /** Two-pass capped apportionment: pass 1 splits `budget` by weight
    * and caps at availability; pass 2 re-apportions the capped
    * shortfall over the sources that still have headroom,
    * proportionally to HEADROOM. Headroom-proportional (not
    * weight-proportional) is what makes exactly two passes sufficient:
    * a share floor(s·hᵢ/H) is < hᵢ whenever s < H, and the +1
    * largest-remainder bump can only lift it to hᵢ — no pass-2 share
    * ever re-caps, so Σalloc == budget whenever the positive-weight
    * availability can hold it (the ApportionPropSpec law; a
    * weight-proportional pass 2 silently strands budget when a high-
    * weight source re-caps). Zero-weight sources never receive — a zero
    * mixture weight means "do not sample from this source", so budget
    * is unfillable (and the capped flags say why) only when the
    * WEIGHTED availability is short. */
  private[operators] def apportion(avail: Seq[(String, Long)],
      weights: Map[String, Long], budget: Long): Seq[(String, Long, Long, Long, Long, Boolean)] = {
    val items = avail.map { case (n, _) => (n, weights.getOrElse(n, 0L)) }
    val availMap = avail.toMap
    val target = largestRemainder(items, budget)
    val alloc1 = target.map { case (n, t) => n -> math.min(t, availMap(n)) }
    val shortfall = target.values.sum - alloc1.values.sum
    val headroom = items.collect { case (n, wi) if wi > 0 && alloc1(n) < availMap(n) =>
      (n, availMap(n) - alloc1(n))
    }
    val add = largestRemainder(headroom, math.min(shortfall, headroom.map(_._2).sum))
    avail.map { case (n, av) =>
      val a2 = math.min(alloc1(n) + add.getOrElse(n, 0L), av)
      (n, av, items.find(_._1 == n).get._2, target(n), a2, target(n) > av)
    }
  }

  /** q127: per-source token-budget allocation. Availability = whitespace
    * token count per source; weight = (source index mod 3) + 1 (an
    * in-query deterministic mixture preference — both engines derive it
    * from the source name); budget = 60% of the corpus total. */
  def q127TokenBudget(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val avail = docs
      .groupBy($"source")
      // coalesce: a source whose EVERY document has NULL text sums to
      // NULL, which the (String, Long) encoder rejects — report it as
      // available=0 instead (the oracle mirrors with coalesce).
      .agg(coalesce(sum(size(graft.functions.TextFunctions.tokens($"text"))), lit(0L))
        .as("available"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val weights = avail.map { case (s, _) =>
      // Default weight 1 when the source name carries no digits OR the
      // digit run overflows Long (a 20+-digit timestamp id), exactly
      // mirroring the oracle's coalesce(try_cast(...)): try_cast of an
      // out-of-range literal is NULL, so both engines land on 1.
      s -> ("""\d+""".r.findFirstIn(s)
        .flatMap(d => scala.util.Try(d.toLong).toOption)
        .map(_ % 3 + 1).getOrElse(1L))
    }.toMap
    val budget = avail.map(_._2).sum * 3 / 5
    val rows = apportion(avail, weights, budget)
    rows.toDF("source", "available_tokens", "weight", "target_tokens",
        "alloc_tokens", "capped")
      .orderBy($"source")
  }

  val q127Sql: String =
    """WITH avail AS (
      |  SELECT source,
      |         coalesce(CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT), 0) AS available,
      |         coalesce(try_cast(regexp_extract(source, '[0-9]+', 0) AS BIGINT)
      |                  % 3 + 1, 1) AS weight
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT sum(available) * 3 // 5 AS b, sum(weight) AS wsum FROM avail
      |), p1 AS (
      |  SELECT a.*, t.b, t.wsum,
      |         t.b * a.weight // t.wsum AS base,
      |         t.b * a.weight % t.wsum AS rem
      |  FROM avail a CROSS JOIN tot t
      |), p1r AS (
      |  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
      |         b - (SELECT sum(base) FROM p1) AS leftover
      |  FROM p1
      |), pass1 AS (
      |  SELECT source, available, weight,
      |         base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS target
      |  FROM p1r
      |), capped1 AS (
      |  SELECT *, least(target, available) AS alloc1 FROM pass1
      |), short AS (
      |  SELECT sum(target) - sum(alloc1) AS s FROM capped1
      |), head AS (
      |  -- pass 2 is HEADROOM-proportional (see apportion's scaladoc):
      |  -- s2 = min(shortfall, total headroom), shares s2*h//H, so no
      |  -- share can re-cap and the budget fills whenever it fits
      |  SELECT c.*,
      |         least(s.s, sum(c.available - c.alloc1) OVER ()) AS s2,
      |         sum(c.available - c.alloc1) OVER () AS hsum,
      |         least(s.s, sum(c.available - c.alloc1) OVER ())
      |           * (c.available - c.alloc1)
      |           // sum(c.available - c.alloc1) OVER () AS base2,
      |         least(s.s, sum(c.available - c.alloc1) OVER ())
      |           * (c.available - c.alloc1)
      |           % sum(c.available - c.alloc1) OVER () AS rem2
      |  FROM capped1 c CROSS JOIN short s
      |  WHERE c.weight > 0 AND c.alloc1 < c.available
      |), headr AS (
      |  SELECT *, row_number() OVER (ORDER BY rem2 DESC, source ASC) AS rk2,
      |         s2 - (SELECT sum(base2) FROM head) AS leftover2
      |  FROM head
      |), pass2 AS (
      |  SELECT source,
      |         least(alloc1 + base2 + CASE WHEN rk2 <= leftover2 THEN 1 ELSE 0 END,
      |               available) AS alloc2
      |  FROM headr
      |)
      |-- CAST: b = sum(available)*3//5 promotes through HUGEINT in DuckDB, so
      |-- target (derived from b) reaches the driver's pandas bridge as float64
      |-- (418.0 vs Spark's 418) without it — same failure q114 hit on pad_waste.
      |SELECT c.source, c.available AS available_tokens, c.weight,
      |       CAST(c.target AS BIGINT) AS target_tokens,
      |       CAST(coalesce(p.alloc2, c.alloc1) AS BIGINT) AS alloc_tokens,
      |       c.target > c.available AS capped
      |FROM capped1 c LEFT JOIN pass2 p USING (source)
      |ORDER BY c.source""".stripMargin

  /** q140: CLUSTER-AWARE split assignment — the REMEDY for the leakage
    * q124 detects: near-dup documents must land in the SAME split, so
    * the split hash keys on the near-dup CLUSTER label (min member id,
    * from the verified LSH pair frame + connected components) instead
    * of the doc id; singletons key on their own id. By construction no
    * near-dup pair can straddle train/val/test — a q124 audit over this
    * assignment returns zero rows (spec-pinned).
    *
    * Scale: rides the SAME cached LSH pair frame as q22/q47/q124 and
    * the pointer-doubling components of q40; the assignment itself is
    * one broadcast-sized left join + a row-local hash. Exact oracle:
    * DuckDB replays the clustering with the q47 recursive-CTE closure
    * and the same md5 split thresholds.
    *
    * Oracle-recall assumption (the q124 discipline, stated here too):
    * the Spark side clusters the BANDED LSH candidate pairs while the
    * oracle computes the exact Jaccard closure, so the hash match
    * relies on the bands having full recall at this threshold on this
    * corpus — empirically exhaustive (the q22 pin). If a future corpus
    * change makes a true >=threshold pair miss every band, group keys
    * shift and q140 reds out: that's a RECALL regression to fix in the
    * band parameters, not an engine/oracle bug. */
  def q140ClusterSplits(spark: SparkSession, d: String,
      threshold: Double = 0.6): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val pairs = Dedup.minhashLshOf(docs, threshold).select($"id_a", $"id_b")
    val labels = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    docs.select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce($"label", $"doc_id"))
      .withColumn("split", splitAssign($"group_key", 0.8, 0.1))
      .select($"doc_id", $"group_key", $"split")
      .orderBy($"doc_id")
  }

  def q140Sql(threshold: Double = 0.6): String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
       |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
       |), counts AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN counts ca ON ca.doc_id = id_a
       |  JOIN counts cb ON cb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= $threshold
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), labels AS (
       |  SELECT src AS id, least(src, min(dst)) AS label FROM reach GROUP BY src
       |), assigned AS (
       |  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
       |)
       |SELECT doc_id, group_key,
       |  CASE WHEN substring(md5(CAST(group_key AS VARCHAR)), 1, 8) < '${hexThreshold(0.8)}' THEN 'train'
       |       WHEN substring(md5(CAST(group_key AS VARCHAR)), 1, 8) < '${hexThreshold(0.9)}' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM assigned ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q129: reshard-movement audit — when a corpus grows from k to k+1
  // shards, how many documents move? Modulo sharding (h mod k) moves
  // ~k/(k+1) of the corpus (nearly everything re-buckets); RENDEZVOUS
  // (highest-random-weight) hashing moves only ~1/(k+1) — the minimal-
  // movement property (Thaler & Ravishankar, HRW). At 100 TB a reshard
  // IS a full rewrite under mod and an incremental one under HRW; this
  // query measures the difference on the actual corpus.
  //
  // Scale shape: the per-document HRW argmax is a ROW-LOCAL projection
  // over a k-element literal array (no explode, no shuffle); the audit
  // aggregates to one row and unpivots to two. The oracle replays the
  // same 60-bit md5 hash per (doc, shard) via generate_series + argmax
  // window — oracle-side O(n·k) is fine at verification scale.
  // --------------------------------------------------------------------

  /** Rendezvous (HRW) shard for `key`: argmax over per-shard 60-bit
    * md5 scores. Ties (cryptographically negligible at 60 bits) break
    * to the higher shard id via lexicographic struct max. */
  def hrwShard(key: Column, nShards: Int, seed: String): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val scored = (0 until nShards).map { s =>
      struct(
        conv(substring(md5(concat_ws(":", lit(seed), key.cast("string"),
          lit(s.toString))), 1, 15), 16, 10).cast("long").as("h"),
        lit(s).as("s"))
    }
    array_max(array(scored: _*)).getField("s")
  }

  /** q129: movement audit, k=8 → k=9, HRW vs modulo. Output one row per
    * strategy: (strategy, n_docs, n_moved). */
  def q129ReshardAudit(spark: SparkSession, d: String, kFrom: Int = 8,
      kTo: Int = 9, seed: String = "shard"): DataFrame = {
    import spark.implicits._
    val h = conv(substring(md5(concat_ws(":", lit(seed),
      $"doc_id".cast("string"))), 1, 15), 16, 10).cast("long")
    val moved = Tables.documents(spark, d).select($"doc_id")
      .withColumn("hrw_moved",
        (hrwShard($"doc_id", kFrom, seed) =!= hrwShard($"doc_id", kTo, seed)).cast("long"))
      .withColumn("mod_moved", ((h % kFrom) =!= (h % kTo)).cast("long"))
      .agg(count(lit(1)).as("n_docs"), sum($"hrw_moved").as("hrw"),
        sum($"mod_moved").as("mod"))
    moved.select(expr(
        "stack(2, 'hrw', n_docs, hrw, 'mod', n_docs, mod) AS (strategy, n_docs, n_moved)"))
      .orderBy($"strategy")
  }

  def q129Sql(kFrom: Int = 8, kTo: Int = 9, seed: String = "shard"): String =
    s"""WITH h AS (
       |  SELECT doc_id, s,
       |         ('0x' || substr(md5('$seed:' || CAST(doc_id AS VARCHAR) || ':'
       |                             || CAST(s AS VARCHAR)), 1, 15))::BIGINT AS hv
       |  FROM documents CROSS JOIN generate_series(0, ${kTo - 1}) g(s)
       |), a_from AS (
       |  SELECT doc_id, s AS shard FROM (
       |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
       |                                         ORDER BY hv DESC, s DESC) AS rn
       |    FROM h WHERE s < $kFrom) WHERE rn = 1
       |), a_to AS (
       |  SELECT doc_id, s AS shard FROM (
       |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
       |                                         ORDER BY hv DESC, s DESC) AS rn
       |    FROM h) WHERE rn = 1
       |), m AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5('$seed:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h0
       |  FROM documents
       |)
       |SELECT 'hrw' AS strategy, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN f.shard <> t.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM a_from f JOIN a_to t USING (doc_id)
       |UNION ALL
       |SELECT 'mod', CAST(count(*) AS BIGINT),
       |       CAST(sum(CASE WHEN h0 % $kFrom <> h0 % $kTo THEN 1 ELSE 0 END) AS BIGINT)
       |FROM m
       |ORDER BY strategy""".stripMargin
}
