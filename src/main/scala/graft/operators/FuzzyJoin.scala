package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Edit-distance fuzzy self-join — find record pairs whose string keys
  * are within a small Levenshtein distance (entity resolution over
  * names/titles/URLs; the reference's closest analogue is its exact
  * identifier matching, service_browse_files.go:299, which this
  * generalizes for dirty data).
  *
  * The naive form is a quadratic cross join with a levenshtein
  * predicate — Spark plans it as BroadcastNestedLoopJoin and it dies at
  * scale. The production shape here is FastSS deletion-neighborhood
  * blocking (Bocek et al., "Fast Similarity Search in Large
  * Dictionaries", 2007): two strings are within edit distance 1 iff
  * their deletion neighborhoods (the string itself plus every
  * one-character-deleted variant) intersect. So each row explodes into
  * |s|+1 variant keys, candidates are an equi-join on the variant — a
  * plain shuffled hash join, never a nested loop — and a codegen'd
  * `levenshtein` verifies candidates exactly. Output == brute force
  * (the blocking is lossless for k=1), cost is O(n·len) keys instead
  * of O(n²) comparisons.
  */
object FuzzyJoin {

  /** Deletion neighborhood of `strCol` as (id, variant) rows: the
    * string itself plus each single-character deletion. Pure generated
    * columns — sequence+transform+explode, no UDF, no shuffle. */
  private def deletionVariants(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol), col(strCol),
      explode(array_union(
        array(col(strCol)),
        transform(sequence(lit(1), length(col(strCol))),
          i => concat(col(strCol).substr(lit(1), i - 1),
                      col(strCol).substr(i + 1, length(col(strCol)))))
      )).as("variant"))

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) <= 1.
    * FastSS candidates, exact verify, distinct (a pair can share
    * several variants). */
  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = deletionVariants(df, idCol, strCol)
    val a = v.select(col(idCol).as("id_a"), col(strCol).as("str_a"), $"variant")
    val b = v.select(col(idCol).as("id_b"), col(strCol).as("str_b"), $"variant")
    a.join(b, Seq("variant"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"str_a", $"str_b").distinct()
      .withColumn("dist", levenshtein($"str_a", $"str_b"))
      .where($"dist" <= 1)
      .select($"id_a", $"id_b", $"dist")
  }

  /** q78: near-identical customer names (one digit off / one character
    * slip) — the dedup screen a catalog ingest runs over entity names.
    * Oracle is the brute-force quadratic join in DuckDB; the blocked
    * path here must equal it exactly. */
  def q78FuzzyNames(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, d).select($"c_custkey", $"c_name")
    pairsWithin1(c, "c_custkey", "c_name")
      .orderBy($"id_a", $"id_b")
  }

  val q78Sql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |       levenshtein(a.c_name, b.c_name) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin
}
