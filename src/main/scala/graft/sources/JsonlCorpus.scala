package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the interchange format every training-data
  * pipeline speaks (one JSON document per line; Dolma/RedPajama/
  * FineWeb all ship this shape). Reads with an EXPLICIT schema — never
  * schema inference, which is a full extra pass over 100 TB and yields
  * run-dependent schemas on dirty data — in PERMISSIVE mode with a
  * corrupt-record column, so one malformed line quarantines instead of
  * failing a multi-hour ingest (DROPMALFORMED silently loses data;
  * FAILFAST turns one bad byte into a dead job).
  *
  * Scale shape: the text source splits by line across executors —
  * embarrassingly parallel; the quarantine split is two filters over
  * one cached pass, and `toDocuments` is a pure projection.
  */
object JsonlCorpus {

  val Corrupt = "_corrupt_record"

  /** The documents-table schema plus the corrupt capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(Corrupt, StringType)))

  /** A parsed ingest: clean rows, quarantined raw lines, and the shared
    * cached scan behind both (release() when done). */
  final case class Ingest(good: DataFrame, quarantine: DataFrame,
      private val raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** Read a JSONL path: `good` rows parsed clean with a non-null text;
    * `quarantine` carries the raw offending line for triage. The frame
    * is cached before the split — Spark refuses a filter that
    * references ONLY the corrupt column on a lazy json scan
    * (SPARK-38523), and the cache also keeps the two splits consistent
    * on re-read. */
  def read(spark: SparkSession, path: String): Ingest = {
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .cache()
    val good = raw.where(col(Corrupt).isNull && col("text").isNotNull)
      .drop(Corrupt)
    val quarantine = raw.where(col(Corrupt).isNotNull || col("text").isNull)
      .select(col(Corrupt).as("raw_line"), col("doc_id"))
    Ingest(good, quarantine, raw)
  }

  /** Conform parsed rows to the documents-table layout: derive n_chars,
    * default lang/source, mint doc_ids after `idOffset` for rows that
    * carry none (monotonically_increasing_id is partition-prefixed —
    * unique and stable per read, no global counter shuffle). */
  def toDocuments(good: DataFrame, idOffset: Long = 0L): DataFrame =
    good
      .withColumn("doc_id",
        coalesce(col("doc_id"), monotonically_increasing_id() + lit(idOffset)))
      .withColumn("lang", coalesce(col("lang"), lit("und")))
      .withColumn("source", coalesce(col("source"), lit("jsonl")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
}
