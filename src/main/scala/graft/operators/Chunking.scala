package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Document chunking for retrieval/embedding pipelines: split each
  * document into overlapping token windows (window W, stride S) — the
  * preprocessing step ahead of embedding generation and vector
  * indexing.
  *
  * Pure column expressions (sequence + posexplode + slice, all
  * codegen'd): chunk starts are 1, 1+S, 1+2S … ≤ n_tokens, each chunk
  * takes up to W tokens, every document yields at least one chunk.
  * One narrow pass, no shuffle until the caller aggregates — the
  * 100 TB shape is scan → generate → write.
  */
object Chunking {

  def chunks(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text = no chunks (greatest/least silently skip SQL nulls and
    // would fabricate a chunk row whose hash is md5("")).
    docs.where($"text".isNotNull)
      .withColumn("__toks", tokens($"text"))
      .withColumn("__n", size($"__toks"))
      .select($"doc_id", $"__toks", $"__n",
        posexplode(sequence(lit(1), greatest($"__n", lit(1)), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .withColumn("chunk_tokens", least(lit(window), $"__n" - $"start" + 1))
      .withColumn("chunk_hash",
        md5(concat_ws(" ", slice($"__toks", $"start", lit(window)))))
      .select($"doc_id", $"chunk_idx", $"start", $"chunk_tokens", $"chunk_hash")
  }

  /** q59: chunk the corpus at window 32 / stride 24 and emit per-chunk
    * rows (hashes instead of text keep the compared output compact). */
  def q59Chunks(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    chunks(Tables.documents(spark, d), window = 32, stride = 24)
      .orderBy($"doc_id", $"chunk_idx")
  }

  val q59Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
      |         len(string_split(lower(text), ' ')) AS n
      |  FROM documents WHERE text IS NOT NULL
      |), c AS (
      |  SELECT doc_id, toks, n, g.i AS start,
      |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY g.i) - 1 AS INT) AS chunk_idx
      |  FROM t, unnest(generate_series(1, greatest(n, 1), 24)) AS g(i)
      |)
      |SELECT doc_id, chunk_idx, start,
      |       least(32, n - start + 1) AS chunk_tokens,
      |       md5(array_to_string(toks[start:start+31], ' ')) AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** CONTENT-DEFINED chunking (the CDC/rsync/LBFS idea at token
    * granularity): a chunk boundary falls AFTER any token whose portable
    * hash ≡ 0 (mod `divisor`), so insertions and deletions only perturb
    * the chunks they touch — unlike the fixed windows of [[chunks]],
    * where one inserted token shifts every downstream chunk hash. That
    * shift-resistance is what makes CDC chunks the right unit for
    * corpus-level duplicate-content detection across near-identical
    * documents.
    *
    * Row-local typed flatMap (primitive string walk, no shuffle — the
    * chunker is scan-side at any corpus size); the boundary hash is
    * [[graft.functions.Hashing.poly30]], which the DuckDB oracle replays
    * with list_reduce, making the whole operator hash-match oracle-able.
    *
    * Output: (doc_id, chunk_id, chunk, n_toks) — every document's
    * chunks in order, trailing partial chunk included.
    */
  def cdcChunksOf(docs: DataFrame, divisor: Int = 8): DataFrame = {
    require(divisor > 1, s"divisor must be > 1, got $divisor")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        // split(" ", -1) keeps interior AND trailing empty tokens —
        // exact parity with DuckDB string_split semantics.
        val toks = text.toLowerCase.split(" ", -1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String, Int)]
        val cur = new StringBuilder
        var curN = 0
        var chunkId = 0
        var i = 0
        while (i < toks.length) {
          if (curN > 0) cur.append(' ')
          cur.append(toks(i))
          curN += 1
          if (graft.functions.Hashing.poly30(toks(i), 131) % divisor == 0) {
            out += ((id, chunkId, cur.result(), curN))
            cur.clear(); curN = 0; chunkId += 1
          }
          i += 1
        }
        if (curN > 0) out += ((id, chunkId, cur.result(), curN))
        out
      }
      .toDF("doc_id", "chunk_id", "chunk", "n_toks")
  }

  /** q122: duplicate-content report over CDC chunks — the chunks (of
    * ≥ `minTokens` tokens) that recur across the corpus, keyed by md5.
    * Scale shape: scan-side chunking → one shuffle on the chunk hash →
    * bounded top-k. This is exactly how block-level dedup scales: the
    * chunk store is a hash-keyed table, never an all-pairs comparison. */
  def q122CdcDedup(spark: SparkSession, d: String, divisor: Int = 8,
      minTokens: Int = 3, topK: Int = 25): DataFrame = {
    import spark.implicits._
    cdcChunksOf(Tables.documents(spark, d), divisor)
      .where($"n_toks" >= minTokens)
      .groupBy(md5($"chunk").as("chunk_key"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct($"doc_id").as("n_docs"),
        min($"doc_id").as("first_doc"))
      .where($"n_occ" > 1)
      .orderBy($"n_occ".desc, $"chunk_key".asc)
      .limit(topK)
  }

  /** DuckDB oracle: replay the boundary hash (poly30 via list_reduce),
    * rebuild chunks with a prefix-sum window, aggregate identically. */
  def q122Sql(divisor: Int = 8, minTokens: Int = 3, topK: Int = 25): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |  WHERE text IS NOT NULL
       |), pos AS (
       |  SELECT doc_id, i, t[i] AS tok
       |  FROM toks, unnest(generate_series(1, len(t))) AS g(i)
       |), h AS (
       |  SELECT doc_id, i, tok,
       |         (list_reduce(list_prepend(0, list_transform(
       |             range(1, length(tok) + 1),
       |             j -> CAST(unicode(substr(tok, CAST(j AS INT), 1)) AS BIGINT))),
       |           (h, c) -> (h * 131 + c) % 1000000007) % $divisor) = 0 AS bnd
       |  FROM pos
       |), cid AS (
       |  SELECT doc_id, i, tok,
       |         coalesce(sum(CASE WHEN bnd THEN 1 ELSE 0 END) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |  FROM h
       |), chunks AS (
       |  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY i) AS chunk,
       |         count(*) AS n_toks
       |  FROM cid GROUP BY 1, 2
       |)
       |SELECT md5(chunk) AS chunk_key, count(*) AS n_occ,
       |       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
       |FROM chunks WHERE n_toks >= $minTokens
       |GROUP BY 1 HAVING count(*) > 1
       |ORDER BY n_occ DESC, chunk_key ASC LIMIT $topK""".stripMargin
}
