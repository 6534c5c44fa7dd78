package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing — assign documents to fixed-token-budget training
  * sequences by concatenating in stable order and splitting at the
  * budget (the standard concat-then-chunk packing): a document belongs
  * to the bin where its first token lands,
  * bin = floor(tokens_before / budget) with tokens_before the running
  * sum of whitespace token counts over the documents ahead of it.
  *
  * Scale shape: the running sum is a window PARTITIONED BY the shard
  * key (lang, source) — packing is per-shard in a real pipeline anyway
  * (shards are written independently), so no partition-less global
  * window appears and each shard's window state lives on one executor.
  * Deterministic: ordering is by doc_id, not arrival order.
  */
object Packing {

  /** Per-document bin assignment within (lang, source) shards. */
  def packed(docs: DataFrame, budgetTokens: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tok", size(split($"text", " ")).cast("long"))
      .withColumn("tok_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("bin", floor($"tok_before" / lit(budgetTokens.toDouble)).cast("long"))
      .select($"doc_id", $"lang", $"source", $"n_tok", $"bin")
  }

  /** Write `docs` as token-balanced training shards: every document
    * joins its [[packed]] bin and the output is laid out as
    * `lang=…/source=…/bin=N` parquet partitions — each directory holds
    * ~`tokensPerShard` tokens (a bin can exceed the budget by at most
    * the tokens of its last document, which straddles the boundary).
    * Deterministic: same corpus, same shards. Returns the shard count.
    *
    * The partitioned layout means a trainer reads shard directories
    * independently and a re-run Overwrites in place; no shard ever
    * depends on another's contents. */
  def writeShards(docs: DataFrame, outDir: String, tokensPerShard: Int): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val assign = packed(docs, tokensPerShard).select($"doc_id", $"bin")
    docs.join(assign, "doc_id")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("lang", "source", "bin").parquet(outDir)
    // an all-filtered corpus writes zero part files — reading the dir
    // back to count shards would fail schema inference; 0 shards is
    // the honest answer, not a crash (hit via curate with an eval set
    // that decontaminates everything).
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(new org.apache.hadoop.fs.Path(outDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
        .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    if (!hasData) 0L
    else spark.read.parquet(outDir)
      .select($"lang", $"source", $"bin").distinct().count()
  }

  /** q50: per-(lang, source, bin) packing summary at a 512-token
    * budget — sequence counts and fill levels. */
  def q50SequencePacking(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    packed(Tables.documents(spark, d), budgetTokens = 512)
      .groupBy($"lang", $"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("total_tokens"),
        min($"doc_id").as("first_doc"))
      .orderBy($"lang", $"source", $"bin")
  }

  val q50Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |), c AS (
      |  SELECT *, coalesce(sum(n_tok) OVER (
      |    PARTITION BY lang, source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
      |  FROM t
      |)
      |SELECT lang, source, CAST(floor(tok_before / 512.0) AS BIGINT) AS bin,
      |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |       min(doc_id) AS first_doc
      |FROM c
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin
}
