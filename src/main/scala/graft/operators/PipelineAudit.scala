package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Per-document PIPELINE FATE audit — the whole curation funnel as one
  * auditable operator: every document gets the FIRST stage that drops
  * it (`quality` rules → `exact_dup` content key → `near_dup` Jaccard
  * against a surviving lower id) or `kept`. This is the provenance
  * table a curation team publishes with a release: it answers "why is
  * doc X not in the corpus" without re-running the pipeline.
  *
  * Composition, not re-implementation: quality = the q28 rule set,
  * exact = the full-text md5 key (the production dedup form), near-dup
  * = the q21 shingle-Jaccard pairs read from the SAME materialized
  * intersection index q21/q116/q133 share. Near-dup keeper policy is
  * pairwise-greedy-by-id (drop any survivor that pairs with a LOWER
  * surviving id) — deterministic and SQL-replayable without a recursive
  * closure; the transitive-cluster keeper lives in q40/q47.
  *
  * Scale: three scans' worth of partial aggs plus the cached pair
  * frame; every join key is doc_id or the content hash. Fate strings
  * and ids only — exact oracle. */
object PipelineAudit {

  def docFates(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keepQ = TextAnalysis.qualityScoreOf(docs)
      .select($"doc_id", coalesce($"keep", lit(false)).as("keepq"))
    val keyed = docs.join(keepQ, "doc_id").where($"keepq")
      .select($"doc_id",
        md5(concat_ws(" ", TextFunctions.tokens($"text"))).as("key"))
    val survivors = keyed
      .withColumn("keeper", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"key")))
      .where($"doc_id" === $"keeper")
      .select($"doc_id")
    val sh = Dedup.docShingles(docs)
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val nearDropped = Dedup.docPairIntersections(docs)
      .join(counts.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
      .join(counts.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
      .where($"inter" / ($"na" + $"nb" - $"inter") >= threshold)
      .join(survivors.select($"doc_id".as("id_a")), "id_a")
      .join(survivors.select($"doc_id".as("id_b")), "id_b")
      .select($"id_b".as("doc_id")).distinct()
    docs.select($"doc_id")
      .join(keepQ, "doc_id")
      .join(survivors.withColumn("surv", lit(true)), Seq("doc_id"), "left")
      .join(nearDropped.withColumn("near", lit(true)), Seq("doc_id"), "left")
      .select($"doc_id",
        when(!$"keepq", "quality")
          .when($"surv".isNull, "exact_dup")
          .when($"near".isNotNull, "near_dup")
          .otherwise("kept").as("fate"))
      .orderBy($"doc_id")
  }

  def q139DocFates(spark: SparkSession, d: String): DataFrame =
    docFates(Tables.documents(spark, d))

  def q139Sql(threshold: Double = 0.8): String =
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split(lower(text), ' ') AS toks
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |         len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS stop_count,
       |         n_chars
       |  FROM t
       |), q AS (
       |  SELECT doc_id, coalesce(
       |    n_tokens BETWEEN 20 AND 1000
       |    AND CAST(stop_count AS DOUBLE) / n_tokens < 0.3
       |    AND CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens < 12.0,
       |    false) AS keepq
       |  FROM s
       |), keyed AS (
       |  SELECT d.doc_id,
       |         md5(array_to_string(string_split(lower(d.text), ' '), ' ')) AS key
       |  FROM documents d JOIN q USING (doc_id) WHERE q.keepq
       |), surv AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS keeper
       |    FROM keyed) WHERE doc_id = keeper
       |), toks2 AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |), shg AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
       |  FROM toks2, unnest(generate_series(1, len(t) - 2)) AS g(i)
       |), cnts AS (
       |  SELECT doc_id, count(*) AS n FROM shg GROUP BY 1
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM shg a JOIN shg b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), neardrop AS (
       |  SELECT DISTINCT i.id_b AS doc_id
       |  FROM inter i
       |  JOIN cnts ca ON ca.doc_id = i.id_a
       |  JOIN cnts cb ON cb.doc_id = i.id_b
       |  JOIN surv sa ON sa.doc_id = i.id_a
       |  JOIN surv sb ON sb.doc_id = i.id_b
       |  WHERE CAST(i.inter AS DOUBLE) / (ca.n + cb.n - i.inter) >= $threshold
       |)
       |SELECT d.doc_id,
       |       CASE WHEN NOT q.keepq THEN 'quality'
       |            WHEN sv.doc_id IS NULL THEN 'exact_dup'
       |            WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
       |            ELSE 'kept' END AS fate
       |FROM documents d
       |JOIN q USING (doc_id)
       |LEFT JOIN surv sv ON sv.doc_id = d.doc_id
       |LEFT JOIN neardrop nd ON nd.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
