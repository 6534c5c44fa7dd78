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
  * Dictionaries", 2007), with the POSITION refinement that makes the
  * candidate set tight instead of merely lossless:
  *
  *   - substitution (equal lengths, distance 1): the two strings share
  *     a deletion variant at the SAME position — join deletions on
  *     (variant, pos);
  *   - insert/delete (length ±1): the longer string's deletion equals
  *     the shorter string itself — join full strings against deletions;
  *   - exact duplicates: equal full strings.
  *
  * Joining deletions on the bare variant (position-blind) would also be
  * correct but admits every cross-position collision — ~len× more
  * candidates, all killed later by the verify. The joins run on the
  * 64-bit xxhash of the variant (8-byte shuffle key; a hash collision
  * can only ADD candidates, which the exact codegen'd `levenshtein`
  * verify removes — still lossless). Cost is O(n·len) keys and a
  * near-true-positive candidate stream, instead of O(n²) comparisons.
  */
object FuzzyJoin {

  /** 64-bit variant key: two independently-seeded murmur32 halves.
    * Collisions only add candidates (removed by the exact verify), so
    * any stable hash works — this one runs in the typed flatMap. */
  private def variantHash(s: String): Long =
    (scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong << 32) |
      (scala.util.hashing.MurmurHash3.stringHash(s, 0x5bd1e995) & 0xffffffffL)

  /** Deletion neighborhood with positions, variants pre-hashed:
    * (id, str, vh, pos) where pos = 0 is the string itself and pos = i
    * is the single deletion at 1-based index i. A typed flatMap with
    * primitive string ops — the interpreted higher-order-function
    * explode costs ~5× more and would be re-evaluated once per join
    * branch referencing this frame. */
  private def deletionVariants(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(strCol)).as[(Long, String)]
      .flatMap { case (id, s) =>
        val sb = new java.lang.StringBuilder(math.max(s.length - 1, 0))
        (0 until s.length).iterator.map { i =>
          sb.setLength(0)
          sb.append(s, 0, i).append(s, i + 1, s.length)
          (id, s, variantHash(sb.toString), i + 1)
        } ++ Iterator.single((id, s, variantHash(s), 0))
      }
      .toDF(idCol, strCol, "vh", "pos")
  }

  /** The variant frame feeds FOUR join branches (deletion×deletion
    * twice, self×all, and the union) — uncached, each branch re-runs
    * the O(n·len) flatMap. Materialized once per (input, columns) with
    * the same bounded-LRU discipline as the dedup family's shingle
    * index (round-8 bench: q78 3.2 s → the explode cost once). */
  private val variantCache =
    new graft.util.PlanCache[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, String), DataFrame](
      maxEntries = 4, onEvict = _.unpersist())

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) <= 1. */
  def pairsWithin1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.where(col(strCol).isNotNull)
    val v = variantCache.getOrElseUpdate(
      (in.queryExecution.analyzed.canonicalized, idCol, strCol))(
      deletionVariants(in, idCol, strCol).cache())
    val dels = v.where($"pos" > 0)
    val selfs = v.where($"pos" === 0)
    def side(tag: String, in: DataFrame, withPos: Boolean) = {
      val cols = Seq(col(idCol).as(s"id_$tag"), col(strCol).as(s"str_$tag"), $"vh") ++
        (if (withPos) Seq($"pos") else Nil)
      in.select(cols: _*)
    }
    // substitutions + (via equal variants at equal positions) some dups
    val subs = side("a", dels, withPos = true)
      .join(side("b", dels, withPos = true), Seq("vh", "pos"))
      .where($"id_a" < $"id_b")
    // insert/delete (one orientation only: shorter self = longer's
    // deletion) + exact dups (self = self) — normalize ids afterwards
    val insdel = side("a", selfs, withPos = false)
      .join(side("b", v, withPos = false), Seq("vh"))
      .where($"id_a" =!= $"id_b")
    def verified(cands: DataFrame) = cands
      .withColumn("dist", levenshtein($"str_a", $"str_b"))
      .where($"dist" <= 1)
      .select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"), $"dist")
    verified(subs).unionByName(verified(insdel)).distinct()
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
