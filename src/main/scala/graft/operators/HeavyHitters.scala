package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Heavy hitters (frequent items) via distributed Misra–Gries — top-k
  * token discovery WITHOUT shuffling the full (token, count) space. At
  * 100 TB the exact groupBy shuffles one row per distinct token per
  * partition; a web-scale vocabulary makes that the dominant shuffle.
  * The MG sketch bounds per-partition state at `capacity` counters with
  * a hard guarantee: any token with global frequency > N/(capacity+1)
  * survives every partition's sketch, so the candidate union is a
  * superset of the true heavy hitters at that threshold.
  *
  * Pipeline: (1) per-partition MG sketches (mapPartitions, zero
  * shuffle); (2) candidate union = groupBy over ≤ capacity×partitions
  * sketch rows (a bounded shuffle, independent of vocabulary size);
  * (3) one exact filtered recount of just the candidates (scan +
  * broadcast IN filter) so emitted counts are EXACT, not MG lower
  * bounds. Output = top `k` by exact count.
  *
  * MG is exact (never evicts) whenever a partition's distinct-token
  * count stays ≤ capacity — true for this synthetic corpus's 31-token
  * vocabulary, which is what licenses the DuckDB oracle on the full
  * top-k; the approximation guarantee for adversarial vocabularies is
  * property-tested in HeavyHittersSpec on skewed generated data.
  */
object HeavyHitters {

  /** Misra–Gries summary of one iterator: at most `capacity` counters;
    * decrement-all when a new item arrives with the table full. */
  private[operators] def mgSketch(it: Iterator[String], capacity: Int): mutable.Map[String, Long] = {
    val counters = mutable.Map.empty[String, Long]
    mgUpdate(counters, it, capacity)
    counters
  }

  /** Fold more items into an existing MG counter table — the streaming
    * update step: MG state folds item-by-item, so resuming from a
    * previous batch's counters is the SAME sketch as one pass over the
    * concatenated stream. */
  private[graft] def mgUpdate(counters: mutable.Map[String, Long],
      it: Iterator[String], capacity: Int): Unit = {
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < capacity => counters.update(t, 1L)
        case None =>
          // decrement every counter; drop zeros (amortized O(1)/item)
          val dead = mutable.ArrayBuffer.empty[String]
          counters.foreach { case (k, c) =>
            if (c == 1) dead += k else counters.update(k, c - 1)
          }
          dead.foreach(counters.remove)
      }
    }
  }

  /** Candidate heavy hitters from per-partition MG sketches: tokens
    * whose summed MG bound ranks in the top `2k`. */
  def candidates(tokensDf: DataFrame, capacity: Int, k: Int): DataFrame = {
    val spark = tokensDf.sparkSession
    import spark.implicits._
    tokensDf.as[String].mapPartitions(it => mgSketch(it, capacity).iterator)
      .toDF("token", "bound")
      .groupBy($"token").agg(sum($"bound").as("bound"))
      .orderBy($"bound".desc, $"token".asc)
      .limit(2 * k)
  }

  /** q77: top-20 corpus tokens by exact count, found via the MG
    * candidate pass + one exact recount of candidates only. */
  def q77HeavyHitters(spark: SparkSession, d: String, k: Int = 20,
      capacity: Int = 64): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, d)
      .select(explode(tokens($"text")).as("token"))
    val cand = candidates(toks, capacity, k)
    toks.join(broadcast(cand.select($"token")), "token")
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(k)
  }

  val q77Sql: String =
    """WITH toks AS (
      |  SELECT u.t AS token
      |  FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents), unnest(toks) AS u(t)
      |)
      |SELECT token, count(*) AS n FROM toks
      |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin
}
