package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-level embedding clustering: spherical k-means over the
  * embeddings table, reusing the deterministic Lloyd trainer that backs
  * the IVF index ([[Similarity.kmeansCentroids]] — first-k init, no
  * RNG). The training-data uses: topic bucketing for mixture weighting,
  * diversity-aware sampling (cap per cluster), and cluster-balanced
  * eval splits.
  *
  * Scale shape is the IVF one: training never shuffles the corpus
  * (per-partition k×dim partial sums, k-row driver reduce per round);
  * assignment is one broadcast-centroids pass; the summary aggregates
  * k rows of state per partition. Iterative refinement (Lloyd) has no
  * SQL-expressible equivalent → rows-only gate, invariants in
  * ClusteringSpec.
  */
object Clustering {

  /** Per-vector cluster assignment: (vec_id, cluster_id, cos) with
    * cosine to the owning centroid. Deterministic: centroids from the
    * seedless trainer, argmax ties break on cluster_id ascending.
    *
    * Delegates to [[Similarity.ivfIndex]] — a k-means clustering IS an
    * IVF coarse layer, and that index is the built-once/query-many
    * artifact with the bounded plan-keyed cache, so repeated clustering
    * calls (and q73's three summary branches) reuse one trained,
    * materialized assignment instead of re-running Lloyd rounds per
    * call. The centroid cosine is one narrow broadcast-join map over
    * the cached assignment. */
  def assign(spark: SparkSession, d: String, k: Int, iters: Int): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, d)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
    val (cents, assigned) = Similarity.ivfIndex(e, k, iters)
    assigned
      .join(broadcast(cents), "cent_id")
      .select($"vec_id", $"cent_id".as("cluster_id"),
        Similarity.cos($"v", $"cv").as("cos"))
  }

  /** q73: cluster summary — size, the medoid-ish representative (the
    * member closest to the centroid; cosine ties break on vec_id
    * ascending), and the dominant ground-truth label with its count
    * (the embeddings table carries a label column — the dominant share
    * is how well unsupervised clusters recover it). */
  /** Train (or hit the ivfIndex cache) and record the centroids for the
    * dynamic oracles — the Verify flow runs queries before dumping
    * oracle SQL, so the literals line up with the dumped parquet.
    * Costs one k-row collect on a cache hit, not a retrain. */
  private def trainAndRecord(spark: SparkSession, d: String, k: Int,
      iters: Int): Unit = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val e0 = Tables.embeddings(spark, d)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
    val (cents, _) = Similarity.ivfIndex(e0, k, iters)
    trainedCentroids = Some(cents.as[(Long, Array[Double])].collect().sortBy(_._1))
  }

  def q73KmeansClusters(spark: SparkSession, d: String, k: Int = 8, iters: Int = 5): DataFrame = {
    import spark.implicits._
    // Record the trained centroids (k×dim doubles — control-plane sized)
    // so the oracle can replay the assignment as pure SQL argmax over
    // centroid LITERALS: Lloyd refinement isn't SQL-expressible, but an
    // assignment against a fixed quantizer is — the same trick the
    // multimodal oracles use for codec math.
    trainAndRecord(spark, d, k, iters)
    val a = assign(spark, d, k, iters)
    val labels = Tables.embeddings(spark, d).select($"vec_id", $"label")
    val al = a.join(labels, "vec_id")
    val sizes = al.groupBy($"cluster_id").agg(count(lit(1)).as("n_vecs"))
    val wRep = Window.partitionBy($"cluster_id").orderBy($"cos".desc, $"vec_id".asc)
    val reps = al
      .withColumn("rn", row_number().over(wRep))
      .where($"rn" === 1)
      .select($"cluster_id", $"vec_id".as("rep_vec_id"))
    val wLab = Window.partitionBy($"cluster_id").orderBy($"n".desc, $"label".asc)
    val domLabel = al.groupBy($"cluster_id", $"label").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wLab))
      .where($"rn" === 1)
      .select($"cluster_id", $"label".as("top_label"), $"n".as("top_label_n"))
    sizes.join(reps, "cluster_id").join(domLabel, "cluster_id")
      .orderBy($"cluster_id")
  }

  /** Centroids trained by the last [[q73KmeansClusters]] run in this
    * JVM — the Verify flow runs every query before dumping oracle SQL,
    * so the literals below line up with the dumped parquet. */
  @volatile private var trainedCentroids: Option[Array[(Long, Array[Double])]] = None

  /** q148's own oracle snapshot: the centroid literals AND the τ they
    * were run with, written in ONE volatile store — reading two globals
    * written at different times (trainedCentroids by any clustering
    * query, τ by q148) could pair a q73 retrain's centroids with a stale
    * τ. Contract is still last-q148-call-wins (the Verify flow runs each
    * query then dumps), but the pair itself can never be mixed. */
  @volatile private var recorded148: Option[(Array[(Long, Array[Double])], Double)] = None

  /** q73's oracle, available once the query has trained: DuckDB replays
    * the argmax assignment against the centroid literals and rebuilds
    * the summary. Decision-level float parity: centroids are
    * unit-normalized, so `list_cosine_similarity(raw, cv)` equals the
    * engine's dot(normalized, cv) up to ~1 ulp, and argmax/rep gaps are
    * orders of magnitude wider (the q24 threshold argument). Every
    * output column is an int/long — no floats are hashed. */
  /** The shared assignment prefix of the dynamic oracles: score every
    * vector against the centroid literals, keep the argmax. */
  private def assignmentCtes(cs: Array[(Long, Array[Double])]): String = {
    val values = cs.map { case (id, v) =>
      // Double.toString: shortest round-trip decimal — DuckDB parses it
      // back to the identical double.
      s"($id, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n       ")
    s"""WITH cents(cluster_id, cv) AS (
       |  VALUES $values
       |), scored AS (
       |  SELECT e.vec_id, e.label, c.cluster_id,
       |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) AS cos
       |  FROM embeddings e CROSS JOIN cents c
       |), assigned AS (
       |  SELECT vec_id, label, cluster_id, cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY cos DESC, cluster_id ASC) AS rn
       |    FROM scored) WHERE rn = 1
       |)""".stripMargin
  }

  def q73OracleSql: Option[String] = trainedCentroids.map { cs =>
    s"""${assignmentCtes(cs)},
       |sizes AS (
       |  SELECT cluster_id, count(*) AS n_vecs FROM assigned GROUP BY 1
       |), reps AS (
       |  SELECT cluster_id, vec_id AS rep_vec_id FROM (
       |    SELECT cluster_id, vec_id, row_number() OVER (
       |      PARTITION BY cluster_id ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM assigned) WHERE rn = 1
       |), labs AS (
       |  SELECT cluster_id, label AS top_label, n AS top_label_n FROM (
       |    SELECT cluster_id, label, count(*) AS n, row_number() OVER (
       |      PARTITION BY cluster_id ORDER BY count(*) DESC, label ASC) AS rn
       |    FROM assigned GROUP BY 1, 2) WHERE rn = 1
       |)
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id, s.n_vecs, r.rep_vec_id,
       |       l.top_label, l.top_label_n
       |FROM sizes s JOIN reps r USING (cluster_id) JOIN labs l USING (cluster_id)
       |ORDER BY cluster_id""".stripMargin
  }

  /** q123: CLUSTER-BALANCED diversity sample — keep the first
    * `perCluster` members (by vec_id, a float-free rank) of every
    * k-means cluster. This is the "diverse subset" pipeline op: where a
    * uniform sample mirrors the corpus's topic skew, round-robin over
    * clusters guarantees every region of embedding space is
    * represented — the standard recipe for seeding eval sets and
    * dedup-aware fine-tuning mixtures.
    *
    * Scale: reuses the cached IVF assignment (no retrain), one
    * per-cluster window whose partitions are corpus/k sized, output is
    * k×perCluster rows. Rank ties are impossible (vec_id is unique), so
    * the only cross-engine float decision is the argmax assignment
    * itself — the same one q73 already proves robust. */
  def q123ClusterSample(spark: SparkSession, d: String, k: Int = 8,
      iters: Int = 5, perCluster: Int = 5): DataFrame = {
    import spark.implicits._
    trainAndRecord(spark, d, k, iters)
    val a = assign(spark, d, k, iters)
    val labels = Tables.embeddings(spark, d).select($"vec_id", $"label")
    val w = Window.partitionBy($"cluster_id").orderBy($"vec_id".asc)
    a.join(labels, "vec_id")
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= perCluster)
      .select($"cluster_id", $"rank", $"vec_id", $"label")
      .orderBy($"cluster_id", $"rank")
  }

  /** q123's dynamic oracle: the same centroid-literal assignment, then
    * row_number by vec_id per cluster. */
  def q123OracleSql: Option[String] = trainedCentroids.map { cs =>
    s"""${assignmentCtes(cs)}
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       |       CAST(rn AS INT) AS rank, vec_id, label
       |FROM (SELECT cluster_id, vec_id, label, row_number() OVER (
       |        PARTITION BY cluster_id ORDER BY vec_id ASC) AS rn
       |      FROM assigned)
       |WHERE rn <= 5
       |ORDER BY cluster_id, rank""".stripMargin
  }

  /** q128: LABEL FRAGMENTATION — the per-label mirror of q73's
    * per-cluster summary: for every ground-truth label, how many
    * clusters do its vectors land in, which cluster is "home" (holds
    * the most members; ties → cluster ascending), and how concentrated
    * is it there? A label spread thin across clusters means the
    * embedding space doesn't separate that class — the eval that tells
    * you whether clustering-based curation (q123's balanced sample,
    * mixture weighting by cluster) will respect label boundaries.
    *
    * Scale: rides the SAME cached IVF assignment as q73/q123 (zero
    * retrain, one narrow join), then aggregates to label×cluster —
    * bounded cardinality. Integer outputs only → exact dynamic oracle
    * via the shared centroid-literal CTE. */
  def q128LabelFragmentation(spark: SparkSession, d: String, k: Int = 8,
      iters: Int = 5): DataFrame = {
    import spark.implicits._
    trainAndRecord(spark, d, k, iters)
    val a = assign(spark, d, k, iters)
    val labels = Tables.embeddings(spark, d).select($"vec_id", $"label")
    val lc = a.join(labels, "vec_id")
      .groupBy($"label", $"cluster_id").agg(count(lit(1)).as("n"))
    val wHome = Window.partitionBy($"label").orderBy($"n".desc, $"cluster_id".asc)
    lc.withColumn("rn", row_number().over(wHome))
      .groupBy($"label")
      .agg(sum($"n").as("n_vecs"),
        count(lit(1)).as("n_clusters"),
        max(when($"rn" === 1, $"cluster_id")).as("home_cluster"),
        max(when($"rn" === 1, $"n")).as("home_n"))
      .orderBy($"label")
  }

  /** q148: SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): k-means the
    * embedding space, find τ-cosine duplicate groups WITHIN each
    * cluster (connected components over the intra-cluster τ-edge
    * graph), and keep ONE representative per group — the member LEAST
    * similar to its centroid, the paper's rule: the typical copy is
    * what the rest of the cluster already covers, the atypical one
    * carries the marginal information. Ties break on vec_id ascending;
    * singletons keep themselves.
    *
    * This is the semantic complement of q24's raw near-dup pairs: q24
    * asks "which vectors are near-identical", SemDeDup asks "which
    * vectors are redundant GIVEN the cluster structure" and emits a
    * per-vector fate (group + kept flag) a curation pass applies
    * directly.
    *
    * Scale: the pairwise step is confined to k-means cells — the
    * SemDeDup trick, and exactly the IVF-blocking bound q24's
    * production path uses (cell population ~n/k; no all-pairs over the
    * corpus). The τ-edge graph is near-dup-sized; components ride
    * [[Dedup.connectedComponents]] (union-find fast path below 500k
    * edges, pointer-doubling label propagation with localCheckpoint
    * lineage cuts above). Reuses the cached IVF assignment — zero
    * retrain after q73/q123/q128 in the same session. Float decisions
    * (τ threshold, min-cos keeper pick) are decision-level robust — the
    * q24/q73 ulp-vs-gap argument.
    */
  def q148SemanticDedup(spark: SparkSession, d: String, k: Int = -1,
      iters: Int = 5, tau: Double = 0.4): DataFrame = {
    import spark.implicits._
    // k = -1 → auto: SemDeDup's intra-cell pair join is quadratic in
    // cell population, so k MUST grow with the corpus (the paper's own
    // posture; the 30x probe measured fixed k=8 at 7.0x cost for 3x
    // data — cells of n/8). Below the cutoff k stays 8 so the whole
    // clustering family (q73/q123/q128/q148) shares ONE trained
    // quantizer and ONE recorded centroid-literal set at oracle-checked
    // SFs; above it, cells are held near 1024 vectors (executor-sized,
    // pairs ~512n — linear).
    val kEff =
      if (k > 0) k
      else {
        val n = Tables.embeddings(spark, d).count()
        if (n <= 4096) 8
        else math.min(4096L, math.ceil(n / 1024.0).toLong).toInt
      }
    trainAndRecord(spark, d, kEff, iters)
    // one atomic snapshot: the oracle replays THESE centroids at THIS τ
    recorded148 = trainedCentroids.map(cs => (cs, tau))
    val a = assign(spark, d, kEff, iters) // vec_id, cluster_id, cos-to-centroid
    val e = Tables.embeddings(spark, d)
      .select($"vec_id", Similarity.normalized($"embedding").as("v"))
    val av = a.select($"vec_id", $"cluster_id").join(e, "vec_id")
    val pairs = av.as("x").join(av.as("y"),
        col("x.cluster_id") === col("y.cluster_id") &&
          col("x.vec_id") < col("y.vec_id"))
      .where(Similarity.cos(col("x.v"), col("y.v")) >= tau)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    val comp = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("label", "group_id")
    val fates = a.join(comp, Seq("vec_id"), "left")
      .select($"vec_id", $"cluster_id",
        coalesce($"group_id", $"vec_id").as("group_id"), $"cos")
    val w = Window.partitionBy($"group_id").orderBy($"cos".asc, $"vec_id".asc)
    fates.withColumn("rn", row_number().over(w))
      .select($"vec_id", $"cluster_id", $"group_id",
        when($"rn" === 1, 1).otherwise(0).as("kept"))
      .orderBy($"vec_id")
  }

  /** q148's dynamic oracle: centroid-literal assignment, all-pairs
    * intra-cluster τ-edges (brute force — the engine's blocking is by
    * the same cluster key, so the sets coincide exactly), recursive
    * closure for components (min-id label, matching
    * [[Dedup.connectedComponents]]'s union-by-min-root), then the
    * min-cos-to-centroid keeper pick. Integer outputs only. */
  def q148OracleSql: Option[String] = recorded148.map { case (cs, recordedTau) =>
    s"""${assignmentCtes(cs).replaceFirst("WITH ", "WITH RECURSIVE ")},
       |pairs AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM assigned x
       |  JOIN assigned y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
       |  JOIN embeddings ea ON ea.vec_id = x.vec_id
       |  JOIN embeddings eb ON eb.vec_id = y.vec_id
       |  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                               CAST(eb.embedding AS DOUBLE[])) >= $recordedTau
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs
       |), reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), comp AS (
       |  SELECT src AS vec_id, least(src, min(dst)) AS group_id
       |  FROM reach GROUP BY src
       |), fates AS (
       |  SELECT a.vec_id, a.cluster_id,
       |         coalesce(c.group_id, a.vec_id) AS group_id, a.cos
       |  FROM assigned a LEFT JOIN comp c USING (vec_id)
       |)
       |SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, group_id,
       |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS kept
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY group_id ORDER BY cos ASC, vec_id ASC) AS rn
       |      FROM fates)
       |ORDER BY vec_id""".stripMargin
  }

  /** q128's dynamic oracle: centroid-literal assignment, label×cluster
    * counts, home pick by (n desc, cluster asc). */
  def q128OracleSql: Option[String] = trainedCentroids.map { cs =>
    s"""${assignmentCtes(cs)},
       |lc AS (
       |  SELECT label, cluster_id, count(*) AS n
       |  FROM assigned GROUP BY 1, 2
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY label
       |                               ORDER BY n DESC, cluster_id ASC) AS rn
       |  FROM lc
       |)
       |SELECT label, CAST(sum(n) AS BIGINT) AS n_vecs,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(max(CASE WHEN rn = 1 THEN cluster_id END) AS BIGINT) AS home_cluster,
       |       CAST(max(CASE WHEN rn = 1 THEN n END) AS BIGINT) AS home_n
       |FROM ranked GROUP BY label
       |ORDER BY label""".stripMargin
  }
}
