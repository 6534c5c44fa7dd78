package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Round-9 corpus-audit operators: CDC chunk dedup (q122),
  * cluster-balanced sampling (q123), split-leakage audit (q124), and
  * per-segment code-switch detection (q125). The oracle gate covers
  * value equality; these specs pin the algebraic invariants the SQL
  * can't express.
  */
class CorpusAuditSpec extends SparkSpec {

  // ---- q122: content-defined chunking ----

  test("CDC chunks reassemble to the lowercased text, in order") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).limit(20).cache()
    val chunks = Chunking.cdcChunksOf(docs)
      .groupBy($"doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"chunk_id", $"chunk"))),
        s => s.getField("chunk")), " ").as("rebuilt"))
    val joined = docs.select($"doc_id", lower($"text").as("expected"))
      .join(chunks, "doc_id")
      .where($"expected" =!= $"rebuilt")
    assert(joined.count() == 0)
  }

  test("CDC boundaries: every non-final chunk ends on a boundary token and contains no interior boundary") {
    val divisor = 8
    val rows = Chunking.cdcChunksOf(
      Tables.documents(spark, sfDir).limit(50), divisor)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { cs =>
      val sorted = cs.sortBy(_.getInt(1))
      val lastId = sorted.last.getInt(1)
      sorted.foreach { r =>
        val toks = r.getString(2).split(" ", -1)
        val hashes = toks.map(t => graft.functions.Hashing.poly30(t, 131) % divisor == 0)
        // no boundary strictly inside the chunk
        assert(!hashes.dropRight(1).contains(true),
          s"interior boundary in chunk ${r.getInt(1)} of doc ${r.getLong(0)}")
        if (r.getInt(1) != lastId)
          assert(hashes.last, s"non-final chunk not boundary-terminated")
      }
    }
  }

  test("CDC chunking is shift-resistant where fixed windows are not: an insertion only perturbs one chunk") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 5
    val edited = base.replaceFirst("delta", "delta inserted")
    val docs = Seq((1L, base.trim), (2L, edited.trim)).toDF("doc_id", "text")
    val chunks = Chunking.cdcChunksOf(docs).collect()
    val a = chunks.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    val b = chunks.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    // the two versions still share at least one identical chunk —
    // the property fixed-window chunking loses after one insertion
    assert((a intersect b).nonEmpty)
  }

  test("q122 report: recurring chunks only, occurrence bounds hold") {
    val rows = Chunking.q122CdcDedup(spark, sfDirMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nOcc, nDocs) = (r.getLong(1), r.getLong(2))
      assert(nOcc > 1 && nDocs >= 1 && nDocs <= nOcc)
    }
  }

  // ---- q123: cluster-balanced sample ----

  test("q123 takes at most perCluster members per cluster, ranked by vec_id") {
    val rows = Clustering.q123ClusterSample(spark, sfDirMid).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.values.foreach { cs =>
      assert(cs.length <= 5)
      val sorted = cs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to cs.length))
      // rank order == vec_id order
      val vecIds = sorted.map(_.getLong(2))
      assert(vecIds.toSeq == vecIds.sorted.toSeq)
    }
    // the sample covers every trained cluster that owns ≥1 vector
    val assigned = Clustering.assign(spark, sfDirMid, 8, 5)
      .select("cluster_id").distinct().collect().map(_.getLong(0)).toSet
    assert(byCluster.keySet == assigned)
  }

  // ---- q124: split leakage ----

  test("q124 pairs straddle splits and are a subset of the LSH pair frame") {
    import spark.implicits._
    val leaks = Sampling.q124SplitLeakage(spark, sfDirMid).collect()
    assert(leaks.nonEmpty)
    leaks.foreach { r =>
      assert(r.getString(3) != r.getString(4))
      assert(r.getDouble(2) >= 0.8)
    }
    val allPairs = Dedup.minhashLsh(spark, sfDirMid, 0.8)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(allPairs))
  }

  // ---- q125: code-switch detection ----

  test("q125 flags a constructed mixed-language document and not a pure one") {
    import spark.implicits._
    val en = ("the cat sat of the mat and a dog ran of the hill and " * 3).trim
    val de = ("der hund und die katze und das haus und der baum und " * 3).trim
    val docs = Seq(
      (1L, en + " " + de, "en"),
      (2L, en, "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.codeSwitchOf(docs, segTokens = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) >= 1 && out(1L).getBoolean(4))
    assert(out(2L).getLong(3) == 0 && !out(2L).getBoolean(4))
  }

  test("q125 segment accounting: n_segments = ceil(tokens/20), n_foreign bounded") {
    import spark.implicits._
    val rows = TextAnalysis.q125CodeSwitch(spark, sfDirMid).collect()
    assert(rows.nonEmpty)
    val nToks = Tables.documents(spark, sfDirMid)
      .select($"doc_id", size(split(lower($"text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val expect = math.ceil(nToks(r.getLong(0)) / 20.0).toLong
      assert(r.getLong(2) == expect)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2))
    }
  }
}
