package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HllAggregator, TextFunctions}
import graft.sources.Tables

/** Distinct-cardinality sketching for corpus vocabulary tracking: the
  * standing "how many distinct tokens does this corpus hold" counter a
  * stats store updates per ingest batch without re-reading history.
  *
  * The registered query emits the SKETCH STATE — (bucket, max_rho) for
  * every non-empty register — not the float estimate: register maxima
  * are order-free integer facts the DuckDB oracle replays exactly from
  * the same portable 60-bit md5 hash, so the sketch pipeline is
  * hash-match verified end to end while the (inherently approximate)
  * estimate stays in spec-land with an error bound. One pass, no
  * pre-distinct: max absorbs duplicates, so the plan is a scan →
  * partial-agg fold of 256-byte states — at 100 TB the shuffle carries
  * one sketch per partition, where a `count(distinct)` would shuffle
  * every distinct token.
  */
object DistinctSketch {

  /** 60-bit portable hashes of all (non-empty) whitespace tokens —
    * duplicates included; the sketch dedups by construction. */
  private[operators] def tokenHashes(docs: DataFrame): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where($"text".isNotNull)
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
      .where($"tok" =!= "")
      .select(conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
      .as[Long]
  }

  /** The corpus vocabulary sketch: one 256-register HLL over token
    * hashes. */
  def vocabSketch(docs: DataFrame): Seq[Int] = {
    val spark = docs.sparkSession
    import spark.implicits._
    tokenHashes(docs).select(new HllAggregator().toColumn).head()
  }

  /** q130: the sketch state as rows — (bucket, max_rho), non-empty
    * registers only. The sketch itself is control-plane sized (256
    * ints), so materializing it driver-side IS the operator's output
    * shape. */
  def q130HllRegisters(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val regs = vocabSketch(Tables.documents(spark, d))
    regs.zipWithIndex
      .collect { case (r, b) if r > 0 => (b, r) }
      .toDF("bucket", "max_rho")
      .orderBy($"bucket")
  }

  val q130Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents WHERE text IS NOT NULL
      |), h AS (
      |  SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
      |  FROM toks WHERE tok <> ''
      |)
      |SELECT CAST(hv % 256 AS INT) AS bucket,
      |       CAST(max(CASE WHEN hv // 256 = 0 THEN 53
      |                ELSE strpos(lpad(bin(hv // 256), 52, '0'), '1') END) AS INT)
      |         AS max_rho
      |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin
}
