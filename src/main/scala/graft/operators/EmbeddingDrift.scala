package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding release drift — the vector-side mirror of the corpus diff
  * ([[CorpusDiff]]): when a model refresh re-embeds the corpus, which
  * vectors actually MOVED? A release is (vec_id, embedding, label);
  * the drift report joins two releases on vec_id and classifies every
  * id as added / removed / kept, splitting kept into drifted
  * (cosine(old, new) below a threshold) vs stable. Per-label rollup —
  * the monitoring table a re-embedding pipeline gates a rollout on:
  * a label whose vectors all drifted is a semantic shift (or a broken
  * encoder head) even though ids and counts look identical.
  *
  * Scale: one full-outer shuffle join on vec_id (both sides hash the
  * same key — co-partitioned), the cosine is one codegen'd expression
  * per matched row, the rollup aggregates to label cardinality. No
  * index, no all-pairs: drift only ever compares a vector to ITS OWN
  * successor. Output columns are counts only, so the oracle hashes no
  * floats — the threshold comparison is decision-level (the q24
  * margin argument), pinned empirically in EmbeddingDriftSpec.
  */
object EmbeddingDrift {

  /** Per-label drift summary of two releases. Inputs need
    * (vec_id, embedding: array&lt;float|double&gt;, label); rows with the
    * same vec_id on both sides are "kept" and compared by cosine.
    * A kept row counts as drifted when cos &lt; `threshold`. The label of
    * a kept/added row comes from the NEW side, of a removed row from
    * the old side. */
  def drift(oldE: DataFrame, newE: DataFrame, threshold: Double): DataFrame = {
    val spark = oldE.sparkSession
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    def normed(df: DataFrame, side: String) = df.select(
      $"vec_id",
      transform(col("embedding"), x => x.cast("double")).as(s"${side}_v"),
      col("label").as(s"${side}_label"))
    val joined = normed(oldE, "old")
      .join(normed(newE, "new"), Seq("vec_id"), "full_outer")
    val cos = graft.operators.Similarity.cos($"old_v", $"new_v")
    joined
      .withColumn("label", coalesce($"new_label", $"old_label"))
      .withColumn("status",
        when($"old_v".isNull, lit("added"))
          .when($"new_v".isNull, lit("removed"))
          .otherwise(lit("kept")))
      .withColumn("drifted",
        $"status" === "kept" && cos < lit(threshold))
      .groupBy($"label")
      .agg(
        sum(when($"status" === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when($"status" === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when($"status" === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"drifted", 1L).otherwise(0L)).as("n_drifted"))
      .orderBy($"label")
  }

  /** q143: drift between two deterministic releases simulated from the
    * embeddings table — v1 drops the newest tail, v2 drops the oldest
    * head, REVERSES every 7th embedding (decisive drift: a vector is
    * nearly orthogonal to its reverse on this corpus) and doubles
    * every 13th non-reversed one (scale-invariant → must NOT count as
    * drift). The oracle replays the same construction in SQL. */
  def q143EmbeddingDrift(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, d).select($"vec_id", $"embedding", $"label")
    val vOld = e.where($"vec_id" <= 450)
    val vNew = e.where($"vec_id" >= 50)
      .withColumn("embedding",
        when($"vec_id" % 7 === 0, reverse($"embedding"))
          .when($"vec_id" % 13 === 0,
            transform($"embedding", x => x * lit(2.0f)))
          .otherwise($"embedding"))
    drift(vOld, vNew, threshold = 0.99)
  }

  val q143Sql: String =
    """WITH v_old AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      |  FROM embeddings WHERE vec_id <= 450
      |), v_new AS (
      |  SELECT vec_id,
      |         CASE WHEN vec_id % 7 = 0
      |                THEN list_reverse(CAST(embedding AS DOUBLE[]))
      |              WHEN vec_id % 13 = 0
      |                -- *2 is exact in FLOAT and DOUBLE alike (exponent
      |                -- bump), so float-multiply-then-widen == this
      |                THEN list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)
      |              ELSE CAST(embedding AS DOUBLE[]) END AS v,
      |         label
      |  FROM embeddings WHERE vec_id >= 50
      |), joined AS (
      |  SELECT coalesce(n.label, o.label) AS label,
      |         CASE WHEN o.vec_id IS NULL THEN 'added'
      |              WHEN n.vec_id IS NULL THEN 'removed'
      |              ELSE 'kept' END AS status,
      |         CASE WHEN o.vec_id IS NOT NULL AND n.vec_id IS NOT NULL
      |              THEN list_cosine_similarity(o.v, n.v) END AS cos
      |  FROM v_old o FULL OUTER JOIN v_new n ON n.vec_id = o.vec_id
      |)
      |SELECT label,
      |       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |       CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN status = 'kept' AND cos < 0.99 THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted
      |FROM joined GROUP BY label ORDER BY label""".stripMargin
}
