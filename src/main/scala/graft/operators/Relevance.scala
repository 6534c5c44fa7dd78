package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Corpus relevance scoring: BM25 ranking against a query term set and
  * per-document TF-IDF top terms — the retrieval half of a training-data
  * pipeline (query-focused corpus slicing, relevance-weighted sampling,
  * building IR eval sets from raw documents).
  *
  * Both operators are engine-portable by construction so the DuckDB
  * oracle hash-matches bit-for-bit:
  *
  *  - Only IEEE +,-,*,/ over values derived from integer counts — no
  *    `ln`/`exp`, whose last-ulp rounding differs across libm builds.
  *    BM25's `ln((N-df+0.5)/(df+0.5))` idf becomes the raw odds ratio
  *    (rank-equivalent per term: ln is monotone); TF-IDF's `ln(N/df)`
  *    becomes linear `N/df`.
  *  - Double additions happen in one fixed left-to-right order on both
  *    engines: the per-term scores pivot to columns first (`max` of a
  *    singleton group per term) and sum as `(c1 + c2) + c3`, never via
  *    an unordered SUM over doubles.
  *
  * Scale shape: one explode→filter (the IN-list prunes to the query's
  * terms BEFORE any shuffle), one groupBy(doc_id, term) for tf, a
  * broadcast of the per-term df (|terms| rows) and the global length
  * stats (1 row), then a groupBy(doc_id) pivot. No shuffle carries more
  * than |matching docs| × |query terms| rows — at 100 TB the cost is the
  * corpus scan plus two bounded aggregations.
  */
object Relevance {

  // BM25 constants as the exact literals the oracle SQL spells out —
  // `k1 + 1.0` is written 2.2, not computed, so both engines parse the
  // identical decimal into the identical double.
  val k1 = 1.2
  val k1Plus1 = 2.2
  val b = 0.75
  val oneMinusB = 0.25

  /** Per-(doc, term) BM25 component scores for `terms`, plus the pivoted
    * per-doc total. Exposed for reuse; see [[q70Bm25]] for the query. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "1..8 query terms")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"doc_id", tokens($"text").as("toks"))
    val dl = toks.select($"doc_id", size($"toks").as("dl"))
    // Global length stats: 1 row, broadcast. Integer sum/count — exact.
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl"))
    // r17: the per-(doc, term) counts are LmScore's cached docTokens
    // frame (jvmTokens parity with the tokens() expression is
    // spec-pinned) — filtering the cached frame replaces an
    // explode+aggregate over the whole corpus per invocation.
    val tf = LmScore.docTokens(docs)
      .where($"tok".isin(terms: _*))
      .select($"doc_id", $"tok".as("term"), $"u_doc".as("tf"))
    // df per term: tf is already distinct on (doc, term), so a count.
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // avgdl and every factor below mirror the oracle SQL's association
    // order exactly — doubles must come out bit-identical.
    val avgdl = $"total_dl".cast("double") / $"n_docs".cast("double")
    val idfOdds =
      ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5)) /
        ($"df".cast("double") + lit(0.5))
    val tfSat =
      ($"tf".cast("double") * lit(k1Plus1)) /
        ($"tf".cast("double") + lit(k1) * (lit(oneMinusB) + lit(b) * ($"dl".cast("double") / avgdl)))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"doc_id", $"term", (tfSat * idfOdds).as("score"))
  }

  /** q70: top-20 documents by BM25 against a fixed 3-term query.
    * Ties (identical scores) break on doc_id ascending so the LIMIT
    * cutoff is deterministic. */
  def q70Bm25(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("spark", "join", "window")
    val perTerm = bm25(Tables.documents(spark, d), terms)
    val pivoted = perTerm.groupBy($"doc_id").agg(
      coalesce(max(when($"term" === terms(0), $"score")), lit(0.0)).as("c1"),
      coalesce(max(when($"term" === terms(1), $"score")), lit(0.0)).as("c2"),
      coalesce(max(when($"term" === terms(2), $"score")), lit(0.0)).as("c3"))
    pivoted
      .select($"doc_id", (($"c1" + $"c2") + $"c3").as("bm25"))
      .orderBy($"bm25".desc, $"doc_id".asc)
      .limit(20)
  }

  val q70Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
      |), dl AS (
      |  SELECT doc_id, len(toks) AS dl FROM toks
      |), stats AS (
      |  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
      |), tf AS (
      |  SELECT doc_id, u.term AS term, count(*) AS tf
      |  FROM toks, unnest(toks) AS u(term)
      |  WHERE u.term IN ('spark', 'join', 'window')
      |  GROUP BY doc_id, u.term
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), sc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |     (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |       (CAST(dl.dl AS DOUBLE) / (CAST(s.total_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
      |    * ((CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
      |       (CAST(dfreq.df AS DOUBLE) + 0.5)) AS score
      |  FROM tf
      |  JOIN dl USING (doc_id)
      |  JOIN dfreq USING (term)
      |  CROSS JOIN stats s
      |), p AS (
      |  SELECT doc_id,
      |    coalesce(max(CASE WHEN term = 'spark'  THEN score END), 0.0) AS c1,
      |    coalesce(max(CASE WHEN term = 'join'   THEN score END), 0.0) AS c2,
      |    coalesce(max(CASE WHEN term = 'window' THEN score END), 0.0) AS c3
      |  FROM sc GROUP BY doc_id
      |)
      |SELECT doc_id, (c1 + c2) + c3 AS bm25
      |FROM p ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** q74: top-3 TF-IDF terms per document for the first 50 docs.
    * Linear idf (`N/df`, no log — see the object doc): score is the
    * exact double `(tf*N)/df` from int tf·N (no overflow: tf ≤ doc
    * length, N = corpus size; the product stays well under 2^63 as
    * BIGINT math) divided by int df. Per-doc ranking via row_number
    * with (score desc, term asc) — fully deterministic. */
  def q74TfidfTerms(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    // r17: same shared frame as q70 (see bm25) — the whole-corpus
    // explode+aggregate ran per invocation before.
    val tf = LmScore.docTokens(docs)
      .select($"doc_id", $"tok".as("term"), $"u_doc".as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(broadcast(stats))
      .select($"doc_id", $"term",
        (($"tf" * $"n_docs").cast("double") / $"df".cast("double")).as("tfidf"))
      .where($"doc_id" < 50)
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"doc_id", $"rank", $"term", $"tfidf")
      .orderBy($"doc_id", $"rank")
  }

  val q74Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
      |), tf AS (
      |  SELECT doc_id, u.term AS term, count(*) AS tf
      |  FROM toks, unnest(toks) AS u(term) GROUP BY doc_id, u.term
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), stats AS (
      |  SELECT count(*) AS n_docs FROM documents
      |), scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    CAST(tf.tf * s.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s
      |  WHERE tf.doc_id < 50
      |), ranked AS (
      |  SELECT doc_id, term, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, term, tfidf FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
}
