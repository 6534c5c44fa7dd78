package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact, the oracle). Scale path:
  * random-hyperplane LSH bucketing — candidates share a signature
  * prefix, so the per-query join touches a small bucket instead of the
  * full corpus; recall is verified against brute force in SimilaritySpec.
  */
object Similarity {

  /** Double-precision dot product of two equal-length array columns —
    * zip_with + left-to-right aggregate (interpreted higher-order
    * functions; kept as the dependency-free fallback and for tests). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine via the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]); on unit vectors this is
    * the dot product. Callers must `CosineSimilarity.register(spark)`
    * first. */
  def cos(a: Column, b: Column): Column =
    call_function(graft.functions.CosineSimilarity.name, a, b)

  /** L2-normalize a float-array column into a double array. An
    * all-zero vector stays zero (dividing by its zero norm would make
    * a NaN vector, and Spark sorts NaN as the LARGEST double — the
    * zero vector would rank as every query's best neighbor).
    *
    * Backed by the codegen'd [[graft.functions.L2Normalize]]: the
    * previous higher-order-function form re-evaluated the interpreted
    * sum-of-squares once per element (Catalyst inlines the norm
    * sub-tree into the lambda) — O(d²) interpreted work per row that
    * dominated every embedding query at bench scale. Semantics are
    * bit-identical (same cast, ascending sum, divide, zero-norm rule);
    * SimilaritySpec pins the equivalence against the old form. */
  def normalized(v: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.L2Normalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(v)))

  /** Brute-force cosine top-k per query vector: the query block (small)
    * is broadcast; every corpus partition scores its rows against all
    * queries with a primitive-array kernel (no per-pair allocation),
    * then a window keeps the top k. Fully distributed — the corpus
    * never leaves the executors. Output is the rank-free
    * (query_id, neighbor_id) set so float rounding can never reorder
    * compared output; dot products sum left-to-right like the DuckDB
    * oracle. */
  def bruteForceTopK(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, d)
      .select($"vec_id", normalized($"embedding").as("v"))
      .as[(Long, Array[Double])]
    // Filter on the DataFrame side so the predicate pushes into the
    // scan instead of deserializing the whole corpus.
    val queries = Tables.embeddings(spark, d)
      .where($"vec_id" < nQueries)
      .select($"vec_id", normalized($"embedding").as("v"))
      .as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(queries)
    val scored = e.mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (idN, v) =>
        qs.iterator.filter(_._1 != idN).map { case (idQ, q) =>
          var s = 0.0
          var j = 0
          while (j < v.length) { s += q(j) * v(j); j += 1 }
          (idQ, idN, s)
        }
      }
    }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= k)
      .select($"query_id", $"neighbor_id")
      .orderBy($"query_id", $"neighbor_id")
  }

  /** Hard-negative mining for contrastive training: per anchor, the k
    * most-similar corpus vectors with a DIFFERENT label — close in
    * embedding space but semantically negative, the pairs a contrastive
    * loss learns most from. Same broadcast-anchors + primitive kernel +
    * bounded window shape as [[bruteForceTopK]]; the label predicate
    * runs inside the kernel loop, so same-label pairs are never even
    * scored. Exact — the all-pairs oracle is valid SQL. The 100 TB
    * path is [[hardNegativesIvf]], which probes IVF lists instead of
    * scanning the corpus.
    */
  def hardNegatives(spark: SparkSession, d: String, k: Int = 5, nAnchors: Int = 10): DataFrame =
    hardNegativesOf(Tables.embeddings(spark, d), k, nAnchors)

  /** DataFrame form of [[hardNegatives]]: `emb` needs (vec_id,
    * embedding, label); anchors are vec_id < nAnchors. */
  def hardNegativesOf(emb: DataFrame, k: Int, nAnchors: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb
      .select($"vec_id", normalized($"embedding").as("v"), $"label")
      .as[(Long, Array[Double], Int)]
    val anchors = emb
      .where($"vec_id" < nAnchors)
      .select($"vec_id", normalized($"embedding").as("v"), $"label")
      .as[(Long, Array[Double], Int)]
      .collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(anchors)
    val scored = e.mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (idN, v, lbl) =>
        qs.iterator.filter(_._3 != lbl).map { case (idQ, q, _) =>
          var s = 0.0
          var j = 0
          while (j < v.length) { s += q(j) * v(j); j += 1 }
          (idQ, idN, s)
        }
      }
    }.toDF("anchor_id", "negative_id", "cos")
    val w = Window.partitionBy($"anchor_id").orderBy($"cos".desc, $"negative_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .where($"rn" <= k)
      .select($"anchor_id", $"negative_id")
      .orderBy($"anchor_id", $"negative_id")
  }

  def hardNegativesSql(k: Int, nAnchors: Int): String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS anchor_id, c.vec_id AS negative_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(c.embedding AS DOUBLE[])) AS cos
       |  FROM embeddings q JOIN embeddings c ON c.label <> q.label
       |  WHERE q.vec_id < $nAnchors
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY anchor_id
       |                               ORDER BY cos DESC, negative_id ASC) AS rn
       |  FROM scored
       |)
       |SELECT anchor_id, negative_id FROM ranked WHERE rn <= $k
       |ORDER BY anchor_id, negative_id""".stripMargin

  /** IVF-bucketed hard negatives — the production shape: anchors probe
    * their nProbe nearest centroid lists, candidates join by cent_id,
    * and the label predicate filters candidates BEFORE scoring. Probes
    * nProbe/nCentroids of the corpus like [[annIvf]]; recall vs the
    * exact [[hardNegatives]] is asserted in SimilaritySpec. */
  def hardNegativesIvf(spark: SparkSession, d: String, k: Int = 5, nAnchors: Int = 10,
      nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 4): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, d)
    val e = emb.select($"vec_id", normalized($"embedding").as("v"))
    val labels = emb.select($"vec_id", $"label")
    val (cents, assigned) = ivfIndex(e, nCentroids, kmeansIters)
    val wProbe = Window.partitionBy($"anchor_id").orderBy($"cos".desc, $"cent_id".asc)
    val aprobes = e.where($"vec_id" < nAnchors)
      .join(labels, "vec_id")
      .select($"vec_id".as("anchor_id"), $"v".as("qv"), $"label".as("anchor_label"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", cos($"qv", $"cv"))
      .withColumn("rn", row_number().over(wProbe))
      .where($"rn" <= nProbe)
      .select($"anchor_id", $"qv", $"anchor_label", $"cent_id")
    val scored = aprobes.join(assigned, Seq("cent_id"))
      .join(labels, "vec_id")
      .where($"label" =!= $"anchor_label")
      .select($"anchor_id", $"vec_id".as("negative_id"), cos($"qv", $"v").as("cos"))
    val topK = udaf(new graft.functions.TopKAggregator(k))
    scored
      .groupBy($"anchor_id")
      .agg(topK($"cos", $"negative_id").as("ids"))
      .select($"anchor_id", explode($"ids").as("negative_id"))
      .orderBy($"anchor_id", $"negative_id")
  }

  def bruteForceTopKSql(k: Int, nQueries: Int): String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                CAST(c.embedding AS DOUBLE[])) AS cos
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id FROM ranked WHERE rn <= $k
       |ORDER BY query_id, neighbor_id""".stripMargin

  val LshPlanes = 6

  /** Random-hyperplane signature: bit p = sign(dot(v, h_p)) where h_p is
    * a deterministic pseudo-random unit direction derived from xxhash64 —
    * no driver-side randomness, reproducible across executors. */
  def lshSignature(v: Column, dim: Int): Column = {
    (0 until LshPlanes).map { p =>
      // plane component j ∈ {-1, +1} from bit of a hash of (p, j):
      // dot(v, h_p) = Σ_j v[j] * sign_pj  — computed via aggregate over
      // the element index.
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, j) => when(xxhash64(lit(p), j).bitwiseAND(1) === 1, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce[Column](_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: hash every vector to a signature bucket; per
    * query, probe every bucket within Hamming distance 2 of its own
    * signature (multi-probe LSH: 1 + 6 + 15 = 22 of 64 buckets ≈ 1/3 of
    * the corpus — neighbors at cosine ≈ 0.4 flip each plane with
    * p ≈ 0.35, so P(≤2 flips of 6) ≈ 0.65). Approximate — recall vs
    * brute force asserted in SimilaritySpec; no SQL oracle (hash-seeded). */
  def annLsh(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10, dim: Int = 64): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val corpus = Tables.embeddings(spark, d)
      .select($"vec_id", normalized($"embedding").as("v"))
    // the signature-augmented corpus is the LSH index — built once per
    // corpus, queried many times (same discipline as the IVF/PQ caches)
    val e = lshSigCache.getOrElseUpdate(
      (corpus.queryExecution.analyzed.canonicalized, dim))(
      corpus.withColumn("sig", lshSignature($"v", dim)).cache())
    val flips1 = (0 until LshPlanes).map(p => $"sig".bitwiseXOR(shiftleft(lit(1), p)))
    val flips2 = for {
      p <- 0 until LshPlanes; q <- (p + 1) until LshPlanes
    } yield $"sig".bitwiseXOR(shiftleft(lit(1), p)).bitwiseXOR(shiftleft(lit(1), q))
    val probes = ($"sig" +: flips1) ++ flips2
    val queries = e.where($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"),
        explode(array(probes: _*)).as("probe"))
    // no distinct(): the probe masks are pairwise distinct and each
    // corpus vector has exactly one signature, so a (query, neighbor)
    // pair matches at most one probe — deduplication would just
    // hash-shuffle the largest intermediate of the job for no effect.
    val scored = broadcast(queries).join(e,
        $"probe" === $"sig" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), cos($"qv", $"v").as("cos"))
    // bounded top-k: shuffle k rows per query, not each query's whole
    // candidate list through a window sort (same shape as annIvf)
    val topK = udaf(new graft.functions.TopKAggregator(k))
    scored
      .groupBy($"query_id")
      .agg(topK($"cos", $"neighbor_id").as("ids"))
      .select($"query_id", explode($"ids").as("neighbor_id"))
      .orderBy($"query_id", $"neighbor_id")
  }

  /** Deterministic spherical k-means coarse quantizer for [[annIvf]]:
    * init = the first `k` vectors by id (no RNG — reproducible across
    * runs/executors), then `iters` Lloyd rounds. Each round is one
    * distributed pass: every partition accumulates per-centroid vector
    * sums + counts against the broadcast centroids (a primitive-array
    * kernel, k×dim partials per partition), the tiny partial set
    * (k × numPartitions rows) reduces on the driver, and the new
    * centroid is the unit-normalized mean (spherical update — we rank
    * by cosine). Empty clusters keep their previous centroid. At 100 TB
    * this is the standard Spark k-means shape: per-partition combine →
    * k-row reduce, never shuffling the corpus. */
  def kmeansCentroids(e: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      k: Int, iters: Int): Array[(Long, Array[Double])] = {
    val spark = e.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = e.orderBy(col(e.columns(0))).limit(k)
      .collect().sortBy(_._1).map(_._2)
    require(cents.nonEmpty, "empty corpus: no centroids")
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = e.mapPartitions { it =>
        val cs = bc.value
        val dim = if (cs.isEmpty) 0 else cs(0).length
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          var best = 0
          var bestS = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val cv = cs(c)
            var s = 0.0
            var j = 0
            while (j < v.length) { s += cv(j) * v(j); j += 1 }
            if (s > bestS) { bestS = s; best = c }
            c += 1
          }
          val sv = sums(best)
          var j = 0
          while (j < v.length) { sv(j) += v(j); j += 1 }
          counts(best) += 1
        }
        Iterator.tabulate(cs.length)(c => (c, sums(c), counts(c)))
          .filter(_._3 > 0)
      }.collect()
      val sums = Array.fill(cents.length)(new Array[Double](cents(0).length))
      val counts = new Array[Long](cents.length)
      partials.foreach { case (c, s, n) =>
        val acc = sums(c)
        var j = 0
        while (j < s.length) { acc(j) += s(j); j += 1 }
        counts(c) += n
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = sums(c)
          var norm = 0.0
          var j = 0
          while (j < m.length) { norm += m(j) * m(j); j += 1 }
          norm = math.sqrt(norm)
          if (norm == 0.0) old else m.map(_ / norm)
        }
      }
      bc.unpersist()
    }
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  // The IVF index (trained quantizer + inverted lists) is a materialized
  // artifact a real deployment builds once and queries many times —
  // cache it per (corpus plan, nCentroids, iters), bounded LRU with
  // unpersist-on-evict, so query latency measures *search*, not a
  // rebuild of the index per query.
  private val ivfIndexCache = new graft.util.PlanCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int),
    (DataFrame, DataFrame)](maxEntries = 4, onEvict = { case (_, a) => a.unpersist() })

  private val lshSigCache = new graft.util.PlanCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int),
    DataFrame](maxEntries = 4, onEvict = _.unpersist())

  // Multi-probe assignments (vec_id → its nAssign nearest centroid
  // lists) are index structure too — the multi-probe inverted lists a
  // deployment stores next to the quantizer (VectorIndexStore's
  // cent_id-partitioned layout) — so steady-state blocked dedup starts
  // from the materialized probe table instead of re-running the
  // corpus × centroids scoring window per query.
  private val ivfProbeCache = new graft.util.PlanCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int, Int, Int),
    DataFrame](maxEntries = 4, onEvict = _.unpersist())

  def clearCaches(): Unit = {
    ivfIndexCache.clear()
    lshSigCache.clear()
    ivfProbeCache.clear()
  }

  /** Scale-safe IVF blocking parameters from the corpus size and a
    * recall target — the sizing rule the 100 TB posture demands, in
    * code rather than comments.
    *
    * `nLists = max(16, ceil(sqrt(n)))`: with √n lists and roughly
    * balanced buckets, candidate volume is Θ(a²·n²/L) = Θ(a²·n^1.5) —
    * sublinear in n² (pinned by IvfAutoSizeSpec), and per-bucket size
    * √n keeps each inverted list a single comfortable partition at any
    * corpus scale.
    *
    * `nAssign` from the recall target via a geometric miss model: a
    * near pair lands in disjoint bucket sets only when every one of the
    * `a` multi-assignments of one member misses the other's set; each
    * extra assignment independently catches a boundary-straddling pair
    * with roughly constant probability (~1−1/e under a random-split
    * boundary model), so `a = ceil(−ln(1−target))`, clamped to [2, 8].
    * 0.9 → 3, 0.95 → 3, 0.99 → 5. The model is a heuristic — recall on
    * a given corpus is deterministic and measured (DedupSpec,
    * IvfAutoSizeSpec), the formula just maps a target to a probe count
    * with the right shape. */
  def ivfAutoSizing(n: Long, recallTarget: Double = 0.95): (Int, Int) = {
    require(recallTarget > 0.0 && recallTarget < 1.0,
      s"recallTarget must be in (0,1): $recallTarget")
    val nLists = math.max(16, math.ceil(math.sqrt(math.max(n, 0L).toDouble)).toInt)
    val nAssign = math.min(8, math.max(2, math.ceil(-math.log(1.0 - recallTarget)).toInt))
    (nLists, nAssign)
  }

  /** The `nAssign`-probe assignment table over a normalized (vec_id, v)
    * corpus — (vec_id, cent_id), one row per probe — built from the
    * cached [[ivfIndex]] quantizer and materialized once per
    * (corpus, quantizer, nAssign). */
  def ivfProbes(e: DataFrame, nCentroids: Int, kmeansIters: Int,
      nAssign: Int): DataFrame =
    ivfProbeCache.getOrElseUpdate(
      (e.queryExecution.analyzed.canonicalized, nCentroids, kmeansIters, nAssign)) {
      val spark = e.sparkSession
      import spark.implicits._
      val (cents, _) = ivfIndex(e, nCentroids, kmeansIters)
      val wAssign = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cent_id".asc)
      val probes = e.crossJoin(broadcast(cents))
        .withColumn("cos", cos($"v", $"cv"))
        .withColumn("rn", row_number().over(wAssign))
        .where($"rn" <= nAssign)
        .select($"vec_id", $"cent_id")
        .cache()
      probes.count() // materialize: both sides of the pair join read it
      probes
    }

  /** Build (or fetch the cached) IVF index over a normalized
    * (vec_id, v) corpus: k-means centroids + the inverted lists (every
    * vector labeled with its nearest centroid, materialized). */
  def ivfIndex(e: DataFrame, nCentroids: Int, kmeansIters: Int): (DataFrame, DataFrame) =
    // Key on the *canonicalized* plan: two reads of the same corpus build
    // structurally identical plans with fresh expression ids, which plain
    // plan equality treats as distinct (a cache that never hits).
    ivfIndexCache.getOrElseUpdate(
      (e.queryExecution.analyzed.canonicalized, nCentroids, kmeansIters)) {
      val spark = e.sparkSession
      import spark.implicits._
      // Cache the normalized corpus for the duration of the build: each
      // Lloyd round is a full pass, and without this every round (and
      // the final assignment) recomputes the read+normalize lineage —
      // k+1 parquet scans for a k-round build. MEMORY_AND_DISK spills
      // rather than evicts at 100 TB; the handle is released once the
      // assignment is materialized.
      val ec = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val cents = spark.createDataset(
            kmeansCentroids(ec.as[(Long, Array[Double])], nCentroids, kmeansIters).toSeq)
          .toDF("cent_id", "cv")
        val wAssign = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cent_id".asc)
        val assigned = ec.crossJoin(broadcast(cents))
          .withColumn("cos", cos($"v", $"cv"))
          .withColumn("rn", row_number().over(wAssign))
          .where($"rn" === 1)
          .select($"vec_id", $"v", $"cent_id")
          .cache()
        assigned.count() // materialize before releasing the build input
        (cents, assigned)
      } finally ec.unpersist()
    }

  /** IVF-style ANN: spherical-k-means coarse quantizer
    * ([[kmeansCentroids]], deterministic seed), every vector assigned to
    * its nearest centroid; a query probes its `nProbe` nearest centroid
    * lists only — the classic inverted-file layout where at scale each
    * centroid list is a partition and probing prunes
    * (nCentroids-nProbe)/nCentroids of the corpus. Lloyd refinement
    * isn't SQL-expressible, but search against the TRAINED quantizer
    * is: [[annIvfOracleSql]] replays assignment, probing, and the
    * cosine top-k in DuckDB against the recorded centroid literals —
    * the q73 dynamic-oracle pattern applied to ANN. */
  def annIvf(spark: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
      nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 4): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, d).select($"vec_id", normalized($"embedding").as("v"))
    val (cents, assigned) = ivfIndex(e, nCentroids, kmeansIters)
    // Record the quantizer for the dynamic oracle (k rows; on a cache
    // hit this is a collect of the already-materialized centroid frame).
    ivfRecorded = Some((cents.as[(Long, Array[Double])].collect().sortBy(_._1),
      k, nQueries, nProbe))
    val wProbe = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cent_id".asc)
    val qprobes = e.where($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", cos($"qv", $"cv"))
      .withColumn("rn", row_number().over(wProbe))
      .where($"rn" <= nProbe)
      .select($"query_id", $"qv", $"cent_id")
    val scored = qprobes.join(assigned, Seq("cent_id"))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), cos($"qv", $"v").as("cos"))
    // top-k via the bounded-buffer aggregator: shuffle k rows per query
    // instead of sorting each query's whole candidate list in a window.
    val topK = udaf(new graft.functions.TopKAggregator(k))
    scored
      .groupBy($"query_id")
      .agg(topK($"cos", $"neighbor_id").as("ids"))
      .select($"query_id", explode($"ids").as("neighbor_id"))
      .orderBy($"query_id", $"neighbor_id")
  }

  /** Quantizer recorded by the last [[annIvf]] run in this JVM, plus
    * the (k, nQueries, nProbe) it ran with — the Verify flow runs every
    * query before dumping oracle SQL, so the literals line up with the
    * dumped parquet. */
  @volatile private var ivfRecorded:
    Option[(Array[(Long, Array[Double])], Int, Int, Int)] = None

  /** q31's dynamic oracle: DuckDB replays IVF *search* against the
    * trained-centroid literals — nearest-centroid assignment for the
    * corpus, top-`nProbe` list selection per query, exact cosine top-k
    * over the probed lists. Float parity is decision-level, the q73
    * argument: every comparison (argmax assignment, probe rank, top-k
    * rank) has gaps orders of magnitude wider than the ulp-level
    * difference between `dot(normalized…)` and
    * `list_cosine_similarity(raw…)`, and the output is id pairs — no
    * floats are hashed. */
  def annIvfOracleSql: Option[String] = ivfRecorded.map { case (cs, k, nQueries, nProbe) =>
    val values = cs.map { case (id, v) =>
      s"($id, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    s"""WITH cents(cent_id, cv) AS (
       |  VALUES $values
       |), assigned AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
       |               c.cent_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1
       |), qprobes AS (
       |  SELECT vec_id AS query_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
       |               c.cent_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c
       |    WHERE e.vec_id < $nQueries) WHERE rn <= $nProbe
       |), scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ne.embedding AS DOUBLE[])) AS cos
       |  FROM qprobes p
       |  JOIN assigned a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
       |  JOIN embeddings qe ON qe.vec_id = p.query_id
       |  JOIN embeddings ne ON ne.vec_id = a.vec_id
       |)
       |SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM scored) WHERE rn <= $k
       |ORDER BY query_id, neighbor_id""".stripMargin
  }

  /** The hyperplane sign matrix behind [[lshSignature]], computed
    * driver-side through the SAME catalyst `XxHash64` the column
    * expression evaluates per row — sign_pj = +1 iff bit 0 of
    * xxhash64(p, j) is set. SimilaritySpec pins matrix == column-expr
    * signatures, so the oracle below can never drift from the engine. */
  def lshSignMatrix(dim: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    Array.tabulate(LshPlanes, dim) { (p, j) =>
      val h = XxHash64(Seq(Literal(p), Literal(j)), 42L)
        .eval(null).asInstanceOf[Long]
      if ((h & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** q26's oracle — static, because the planes are a pure function of
    * (plane, component) hashing, not of any training run: rebuild every
    * signature from the ±1 plane literals, take candidates at Hamming
    * distance ≤ 2 (`bit_count(xor(sig_q, sig_c)) <= 2` ≡ the engine's
    * 22 multi-probe masks), exact cosine top-k. Sign decisions compare
    * a raw-space projection (oracle) with a normalized-space one
    * (engine) — identical sign mathematically (positive scaling), and
    * the rounding margin on |proj| is the q24 threshold argument. */
  def annLshOracleSql(k: Int, nQueries: Int, dim: Int): String = {
    val values = lshSignMatrix(dim).zipWithIndex.map { case (row, p) =>
      s"($p, [${row.map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    s"""WITH planes(p, hv) AS (
       |  VALUES $values
       |), sigs AS (
       |  SELECT e.vec_id,
       |         CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.hv) > 0
       |                       THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS sig
       |  FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id
       |), scored AS (
       |  SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
       |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                CAST(ce.embedding AS DOUBLE[])) AS cos
       |  FROM sigs qs
       |  JOIN sigs cs ON bit_count(xor(qs.sig, cs.sig)) <= 2
       |              AND cs.vec_id <> qs.vec_id
       |  JOIN embeddings qe ON qe.vec_id = qs.vec_id
       |  JOIN embeddings ce ON ce.vec_id = cs.vec_id
       |  WHERE qs.vec_id < $nQueries
       |)
       |SELECT query_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM scored) WHERE rn <= $k
       |ORDER BY query_id, neighbor_id""".stripMargin
  }
}
