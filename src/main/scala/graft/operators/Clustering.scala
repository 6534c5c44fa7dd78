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
  def q73KmeansClusters(spark: SparkSession, d: String, k: Int = 8, iters: Int = 5): DataFrame = {
    import spark.implicits._
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
}
