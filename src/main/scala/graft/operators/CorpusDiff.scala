package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus release diff — what changed between two versions of a
  * document table: per-document status (added / removed / unchanged /
  * modified) and, for modified documents, how much of the old text
  * survives (3-gram shingle Jaccard, exact integers → one IEEE
  * division). The release-gate view a training-data owner reads before
  * switching a run to a new corpus snapshot; pairs naturally with
  * [[graft.sources.SnapshotReads.readAt]] for version pinning
  * (CorpusDiffSpec drives it through two MetaStore snapshots).
  *
  * Scale: one full-outer join on doc_id (both sides shuffle once on the
  * key) classifies every document with a codegen'd comparison; the
  * shingle work runs ONLY for modified documents — churn-bounded, not
  * corpus-bounded. A release where 1% of documents changed shingles 1%
  * of the corpus.
  */
object CorpusDiff {

  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val spark = oldDocs.sparkSession
    import spark.implicits._
    val o = oldDocs.select($"doc_id", $"text".as("old_text"))
    val n = newDocs.select($"doc_id", $"text".as("new_text"))
    val joined = o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"old_text".isNull, lit("added"))
          .when($"new_text".isNull, lit("removed"))
          .when($"old_text" === $"new_text", lit("unchanged"))
          .otherwise(lit("modified")))

    val modifiedIds = joined.where($"status" === "modified").select($"doc_id")
    val oldSh = Dedup.docShingles(
      oldDocs.join(modifiedIds, Seq("doc_id"), "left_semi"))
    val newSh = Dedup.docShingles(
      newDocs.join(modifiedIds, Seq("doc_id"), "left_semi"))
    val na = oldSh.groupBy($"doc_id").agg(count(lit(1)).as("na"))
    val nb = newSh.groupBy($"doc_id").agg(count(lit(1)).as("nb"))
    val inter = oldSh.join(newSh, Seq("doc_id", "sh"))
      .groupBy($"doc_id").agg(count(lit(1)).as("inter"))
    // null semantics pinned to the oracle: a side with no shingles
    // (text under one shingle long) yields null, disjoint shingle sets
    // yield 0.0 — never NaN
    val jac = modifiedIds
      .join(na, Seq("doc_id"), "left").join(nb, Seq("doc_id"), "left")
      .join(inter, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"na".isNotNull && $"nb".isNotNull,
          coalesce($"inter", lit(0L)) /
            ($"na" + $"nb" - coalesce($"inter", lit(0L)))).as("jaccard"))

    joined.join(jac, Seq("doc_id"), "left")
      .select($"doc_id", $"status", $"jaccard")
      .orderBy($"doc_id")
  }

  /** q119: diff two deterministic "releases" simulated from the
    * documents table — v1 drops the newest tail, v2 drops the oldest
    * head and rewrites every 10th document (so all four statuses
    * occur). The oracle replays the same construction in SQL. */
  def q119CorpusDiff(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val vOld = docs.where($"doc_id" <= 450)
    val vNew = docs.where($"doc_id" >= 50)
      .withColumn("text",
        when($"doc_id" % 10 === 0, concat($"text", lit(" revised in v2")))
          .otherwise($"text"))
    diff(vOld, vNew)
  }

  val q119Sql: String =
    """WITH v_old AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id <= 450
      |), v_new AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 10 = 0 THEN text || ' revised in v2'
      |              ELSE text END AS text
      |  FROM documents WHERE doc_id >= 50
      |), joined AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |         o.text AS old_text, n.text AS new_text,
      |         CASE WHEN o.text IS NULL THEN 'added'
      |              WHEN n.text IS NULL THEN 'removed'
      |              WHEN o.text = n.text THEN 'unchanged'
      |              ELSE 'modified' END AS status
      |  FROM v_old o FULL OUTER JOIN v_new n ON n.doc_id = o.doc_id
      |), shing AS (
      |  SELECT doc_id, side, array_to_string(t[i:i+2], ' ') AS sh
      |  FROM (
      |    SELECT doc_id, 'a' AS side, string_split(lower(old_text), ' ') AS t
      |    FROM joined WHERE status = 'modified'
      |    UNION ALL
      |    SELECT doc_id, 'b', string_split(lower(new_text), ' ')
      |    FROM joined WHERE status = 'modified'
      |  ), unnest(generate_series(1, len(t) - 2)) AS g(i)
      |  GROUP BY 1, 2, 3
      |), counts AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS na,
      |         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS nb
      |  FROM shing GROUP BY 1
      |), inter AS (
      |  SELECT a.doc_id, count(*) AS i
      |  FROM shing a JOIN shing b
      |    ON a.doc_id = b.doc_id AND a.sh = b.sh AND a.side = 'a' AND b.side = 'b'
      |  GROUP BY 1
      |)
      |SELECT j.doc_id, j.status,
      |       -- na>0 AND nb>0: a modified doc whose text is under one
      |       -- shingle long on EITHER side is NULL (matching the
      |       -- engine's missing-aggregate-row semantics), not 0.0 —
      |       -- the conditional SUM would otherwise make a na=0 row.
      |       CASE WHEN j.status = 'modified' AND c.na > 0 AND c.nb > 0
      |            THEN CAST(coalesce(i.i, 0) AS DOUBLE)
      |                 / (c.na + c.nb - coalesce(i.i, 0))
      |            ELSE NULL END AS jaccard
      |FROM joined j
      |LEFT JOIN counts c ON c.doc_id = j.doc_id
      |LEFT JOIN inter i ON i.doc_id = j.doc_id
      |ORDER BY j.doc_id""".stripMargin

  /** q134: RELEASE MANIFEST — per-shard content checksums for corpus
    * release integrity. Every document's normalized-content hash (the
    * exact-dedup key family: md5 of the whitespace-token join, 60
    * portable bits) folds into its shard's checksum with XOR — an
    * order-free, associative, partial-agg-friendly fold, so a 100 TB
    * manifest is one scan with 8 rows of state per partition and NO
    * sort anywhere. Two releases' manifests diff shard-wise: a changed
    * shard pinpoints where to run the (expensive) per-document
    * [[diff]], the same narrowing trick as rsync's block checksums.
    * Shard = content-independent doc_id hash, so a single edited
    * document flips exactly its own shard's checksum. */
  def releaseManifest(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idHash = conv(substring(md5(concat_ws(":", lit("manifest"),
      $"doc_id".cast("string"))), 1, 15), 16, 10).cast("long")
    val contentHash = conv(substring(md5(concat_ws(" ",
      graft.functions.TextFunctions.tokens($"text"))), 1, 15), 16, 10).cast("long")
    docs.where($"text".isNotNull)
      .select(($"doc_id"), (idHash % nShards).cast("int").as("shard"),
        contentHash.as("ch"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(ch)").as("checksum"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"shard")
  }

  def q134ReleaseManifest(spark: SparkSession, d: String): DataFrame =
    releaseManifest(Tables.documents(spark, d))

  /** Per-document manifest contributions: (shard, ±1, content hash) —
    * the unit the incremental fold consumes. */
  private def manifestRows(docs: DataFrame, sign: Int, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idHash = conv(substring(md5(concat_ws(":", lit("manifest"),
      $"doc_id".cast("string"))), 1, 15), 16, 10).cast("long")
    val contentHash = conv(substring(md5(concat_ws(" ",
      graft.functions.TextFunctions.tokens($"text"))), 1, 15), 16, 10).cast("long")
    docs.where($"text".isNotNull)
      .select((idHash % nShards).cast("int").as("shard"),
        lit(sign.toLong).as("n_docs"), contentHash.as("checksum"))
  }

  /** The incremental manifest core: (shard, n_docs, checksum) with NO
    * min/max (order statistics don't survive removals; the full
    * [[releaseManifest]] keeps them for the build-from-scratch case). */
  def manifestCore(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    manifestRows(docs, 1, nShards)
      .groupBy($"shard")
      .agg(sum($"n_docs").as("n_docs"), expr("bit_xor(checksum)").as("checksum"))
      .orderBy($"shard")
  }

  /** Manifest-NARROWED release diff: compare the two versions' shard
    * manifests first, then run the per-document [[diff]] only over
    * documents whose shard actually changed — the rsync narrowing made
    * real. Documents in untouched shards are provably identical (equal
    * count + equal XOR of content hashes per doc_id-stable shard;
    * doc_ids don't move shards between versions), so the expensive
    * full-outer diff runs on changed shards only. At 100 TB with a
    * localized release this reads 1/nShards of the corpus per touched
    * shard instead of everything; raise nShards to tighten. Returns the
    * same rows [[diff]] would for changed-shard docs — the spec pins
    * equality. */
  def selectiveDiff(vOld: DataFrame, vNew: DataFrame, nShards: Int = 8): DataFrame = {
    val spark = vOld.sparkSession
    import spark.implicits._
    val changed = manifestCore(vOld, nShards).as("o")
      .join(manifestCore(vNew, nShards).as("n"), Seq("shard"), "full")
      .where($"o.n_docs".isNull || $"n.n_docs".isNull ||
        $"o.n_docs" =!= $"n.n_docs" || $"o.checksum" =!= $"n.checksum")
      .select($"shard")
    val idHash = conv(substring(md5(concat_ws(":", lit("manifest"),
      $"doc_id".cast("string"))), 1, 15), 16, 10).cast("long")
    def restrict(df: DataFrame) = df
      .withColumn("__shard", (idHash % nShards).cast("int"))
      .join(broadcast(changed), $"__shard" === $"shard")
      .drop("__shard", "shard")
    diff(restrict(vOld), restrict(vNew))
  }

  /** Fold a release delta into a standing manifest WITHOUT touching the
    * corpus behind it: XOR is self-inverse, so a removed document's
    * hash folds in with the SAME operation that added it, and the doc
    * count rides a signed sum. One 8-key shuffle over standing rows +
    * delta docs — at 100 TB the update is O(delta), and a manifest
    * mismatch against [[manifestCore]] of the actual corpus pinpoints
    * the corrupted shard. */
  def updateManifest(standing: DataFrame, added: DataFrame,
      removed: DataFrame, nShards: Int = 8): DataFrame = {
    val spark = standing.sparkSession
    import spark.implicits._
    standing.select($"shard", $"n_docs", $"checksum")
      .unionByName(manifestRows(added, 1, nShards))
      .unionByName(manifestRows(removed, -1, nShards))
      .groupBy($"shard")
      .agg(sum($"n_docs").as("n_docs"), expr("bit_xor(checksum)").as("checksum"))
      .where($"n_docs" > 0)
      .orderBy($"shard")
  }

  val q134Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5('manifest:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |              % 8 AS INT) AS shard,
      |         ('0x' || substr(md5(array_to_string(string_split(lower(text), ' '), ' ')), 1, 15))::BIGINT AS ch
      |  FROM documents WHERE text IS NOT NULL
      |)
      |SELECT shard, count(*) AS n_docs, bit_xor(ch) AS checksum,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM h GROUP BY 1 ORDER BY shard""".stripMargin
}
