package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent corpus-level language statistics with INCREMENTAL
  * maintenance — the standing-state sibling of [[graft.operators.DedupIndex]]
  * (content keys) and [[VectorIndexStore]] (embeddings), holding the
  * bigram count table that [[TextAnalysis.bigramFamiliarityOf]] and
  * bigram lift read.
  *
  * Counts are re-aggregable partials (sum merges with sum — the
  * [[IncrementalAgg]] discipline), so when 1 TB lands on a 100 TB
  * corpus the update costs one partial-agg pass over the DELTA plus a
  * merge shuffle of two vocabulary-sized frames; the standing corpus
  * is never re-read. State is written as immutable versions
  * (`v=N` directories, highest wins) because Spark cannot overwrite a
  * table it is reading; versions make update crash-safe — a torn write
  * leaves the previous version intact and a re-run simply writes the
  * next N.
  *
  * The online use: score INCOMING documents against the standing
  * statistics ([[familiarityAgainst]]) — a streaming micro-batch can
  * quality-bucket its documents without touching the corpus at all.
  */
object CorpusStatsStore {

  private def countsRoot(dir: String) = s"$dir/bigram_counts"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val root = new Path(countsRoot(dir))
    val f = fs(spark, dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Int] =
    versions(spark, dir).lastOption

  /** Delta partials: the bigram count table of just these docs. */
  private def deltaCounts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where($"text".isNotNull)
      .select($"text").as[String]
      .flatMap(t => t.toLowerCase.split(' ').sliding(2)
        .withFilter(_.length == 2).map(_.mkString(" ")))
      .toDF("bigram")
      .groupBy($"bigram").agg(count(lit(1)).as("n"))
  }

  /** Initialize the store from a corpus. Returns the version written. */
  def build(docs: DataFrame, dir: String): Int = {
    val spark = docs.sparkSession
    deltaCounts(docs).write.mode(SaveMode.Overwrite)
      .parquet(s"${countsRoot(dir)}/v=1")
    1
  }

  /** Merge a DELTA of newly-arrived documents into the standing counts.
    * One partial pass over the delta + one vocabulary-sized merge; the
    * corpus behind the standing state is not touched. */
  def update(deltaDocs: DataFrame, dir: String): Int = {
    val spark = deltaDocs.sparkSession
    import spark.implicits._
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no corpus stats at $dir — build first"))
    val merged = counts(spark, dir)
      .unionByName(deltaCounts(deltaDocs))
      .groupBy($"bigram").agg(sum($"n").as("n"))
    merged.write.mode(SaveMode.Overwrite)
      .parquet(s"${countsRoot(dir)}/v=${v + 1}")
    v + 1
  }

  /** The standing bigram count table (latest version). */
  def counts(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no corpus stats at $dir — build first"))
    spark.read.parquet(s"${countsRoot(dir)}/v=$v")
  }

  /** Familiarity scoring of (possibly brand-new) documents against the
    * STANDING statistics — identical math to
    * [[TextAnalysis.bigramFamiliarityOf]] (mean-thresholded familiar
    * set, one exact int/int division, head/middle/tail buckets), with
    * the counts read from the store instead of recomputed. A micro-batch
    * scores against a 100 TB corpus's statistics by reading a
    * vocabulary-sized table. */
  def familiarityAgainst(docs: DataFrame, dir: String): DataFrame = {
    val spark = docs.sparkSession
    TextAnalysis.familiarityScore(docs, counts(spark, dir))
  }
}
