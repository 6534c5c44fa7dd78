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
}
