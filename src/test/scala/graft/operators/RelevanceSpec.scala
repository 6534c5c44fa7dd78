package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelevanceSpec extends SparkSpec {

  test("bm25 per-term scores match a driver-side reference computation") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val terms = Seq("spark", "join", "window")
    val got = Relevance.bm25(docs, terms)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    // Brute-force reference on the collected corpus.
    val corpus = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
    val n = corpus.length
    val totalDl = corpus.map(_._2.length.toLong).sum
    val avgdl = totalDl.toDouble / n.toDouble
    val dfm = terms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    var checked = 0
    corpus.foreach { case (id, toks) =>
      val dl = toks.length
      terms.foreach { t =>
        val tf = toks.count(_ == t)
        if (tf > 0) {
          val df = dfm(t)
          val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
          val sat = (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
          assert(got((id, t)) === sat * idf, s"doc $id term $t")
          checked += 1
        } else assert(!got.contains((id, t)))
      }
    }
    assert(checked > 10, "corpus should contain the query terms")
  }

  test("q70 ranks by the pivoted fixed-order sum with doc_id tiebreak") {
    val out = Relevance.q70Bm25(spark, sfDir).collect()
    assert(out.length == 20)
    val scores = out.map(r => (r.getDouble(1), r.getLong(0)))
    // Sorted by score desc, then doc_id asc.
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
    assert(scores.forall(_._1 > 0.0))
  }

  test("q74 tf-idf picks each doc's rarest-weighted terms deterministically") {
    import spark.implicits._
    val out = Relevance.q74TfidfTerms(spark, sfDir).collect()
    val byDoc = out.groupBy(_.getLong(0))
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count().toInt
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
      // scores non-increasing with rank
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.sameElements(byRank.sorted.reverse))
      // tfidf = tf*N/df ≥ 1 (term occurs at least once, df ≤ N)
      assert(byRank.forall(_ >= 1.0))
    }
    assert(byDoc.keySet.forall(_ < 50))
    // determinism across partitioning
    val again = Relevance.q74TfidfTerms(spark, sfDir).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
    assert(nDocs > 0)
  }
}
