package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.rand

import graft.SparkSpec
import graft.meta.{MetaStore, Model}
import graft.sources.SnapshotReads

/** Release-diff semantics on a hand corpus, and the intended
  * deployment shape: diffing two snapshot-pinned reads of one table. */
class CorpusDiffSpec extends SparkSpec {

  test("statuses and change ratio: added, removed, unchanged, modified") {
    import spark.implicits._
    val common = "alpha beta gamma delta eps zeta"
    val vOld = Seq(
      (1L, common),                   // unchanged
      (2L, common + " tail one"),     // modified (shares a prefix)
      (3L, "doomed text goes away"))  // removed
      .toDF("doc_id", "text")
    val vNew = Seq(
      (1L, common),
      (2L, common + " tail two"),
      (4L, "fresh arrival text here")) // added
      .toDF("doc_id", "text")
    val rows = CorpusDiff.diff(vOld, vNew).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(1L) == (("unchanged", None)))
    assert(rows(3L) == (("removed", None)))
    assert(rows(4L) == (("added", None)))
    val (st, Some(j)) = rows(2L)
    assert(st == "modified")
    // 8 tokens → 6 shingles per side, 5 shared (only the final
    // "zeta tail one|two" shingle differs) → jaccard 5/7
    assert(j == 5.0 / 7.0)
  }

  test("modified doc with a sub-shingle side yields NULL jaccard, not 0.0") {
    import spark.implicits._
    // doc 1: new side has <3 tokens (no shingles) — one-sided short.
    // doc 2: BOTH sides <3 tokens. Either way jaccard must be NULL;
    // the q119 oracle's conditional-SUM shape would have made 0.0 for
    // doc 1 before the na>0 AND nb>0 guard.
    val vOld = Seq((1L, "alpha beta gamma delta"), (2L, "hi")).toDF("doc_id", "text")
    val vNew = Seq((1L, "um"), (2L, "yo")).toDF("doc_id", "text")
    val rows = CorpusDiff.diff(vOld, vNew).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.isNullAt(2))).toMap
    assert(rows(1L) == (("modified", true)))
    assert(rows(2L) == (("modified", true)))
  }

  test("diff of two snapshot-pinned reads — the release-gate deployment shape") {
    import spark.implicits._
    import MetaStore._
    val store = new MetaStore(spark, Files.createTempDirectory("diff-meta").toString)
    val dataDir = Files.createTempDirectory("diff-data").toString

    val f1 = s"$dataDir/v1.parquet"
    val f2 = s"$dataDir/v2.parquet"
    Seq((1L, "one two three four"), (2L, "to be dropped"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(f1)
    Seq((1L, "one two three four"), (3L, "newly added doc"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(f2)

    def ts(s: String) = Timestamp.valueOf(s)
    store.write("tables", spark.createDataset(Seq(
      Model.TableMeta("db", "corpus", Seq(
        Model.TableColumn("doc_id", "bigint"), Model.TableColumn("text", "string")),
        Seq.empty, Some(2L), ts("2026-01-02 00:00:00")))))
    store.write("snapshots", spark.createDataset(Seq(
      Model.SnapshotMeta("db", "corpus", ts("2026-01-01 00:00:00"), 1L, None, "append", "m1", Map.empty),
      Model.SnapshotMeta("db", "corpus", ts("2026-01-02 00:00:00"), 2L, Some(1L), "overwrite", "m2", Map.empty))))
    store.write("files", spark.createDataset(Seq(
      Model.FileMeta("db", "corpus", 1L, 0, f1, "PARQUET", 0, Map.empty, 2, 100),
      Model.FileMeta("db", "corpus", 2L, 0, f2, "PARQUET", 0, Map.empty, 2, 100))))

    val out = CorpusDiff.diff(
        SnapshotReads.readAt(store, "db", "corpus", 1L),
        SnapshotReads.readAt(store, "db", "corpus", 2L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "removed", 3L -> "added"))
  }

  test("release manifest: editing one document flips exactly its own shard's checksum") {
    import spark.implicits._
    def corpus(edit: Boolean) = (1L to 40L).map { i =>
      val t = if (edit && i == 17L) "edited text here" else s"stable text number $i"
      (i, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = CorpusDiff.releaseManifest(corpus(edit = false)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = CorpusDiff.releaseManifest(corpus(edit = true)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a.keySet == b.keySet)
    val changed = a.keySet.filter(s => a(s) != b(s))
    assert(changed.size == 1, s"changed=$changed")
    // counts identical everywhere; only the checksum moved
    assert(a.forall { case (s, (n, _)) => b(s)._1 == n })
  }

  test("incremental manifest: XOR-folding a delta equals a full rebuild (removal = re-fold)") {
    import spark.implicits._
    def corpus(rows: (Long, String)*) = rows.map { case (id, t) =>
      (id, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val v1 = corpus((1L to 40L).map(i => i -> s"text number $i"): _*)
    // v2: doc 7 modified, doc 13 removed, docs 41-42 added
    val v2 = corpus(((1L to 40L).filter(_ != 13L).map { i =>
      i -> (if (i == 7L) "rewritten seven" else s"text number $i")
    } ++ Seq(41L -> "fresh one", 42L -> "fresh two")): _*)
    val standing = CorpusDiff.manifestCore(v1)
    val added = corpus(7L -> "rewritten seven", 41L -> "fresh one", 42L -> "fresh two")
    val removed = corpus(7L -> "text number 7", 13L -> "text number 13")
    val inc = CorpusDiff.updateManifest(standing, added, removed)
      .collect().map(_.toSeq).toSet
    val full = CorpusDiff.manifestCore(v2).collect().map(_.toSeq).toSet
    assert(inc == full)
  }

  test("selective diff equals the full diff on changed-shard docs, and skips clean shards") {
    import spark.implicits._
    def corpus(rows: (Long, String)*) = rows.map { case (id, t) =>
      (id, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val v1 = corpus((1L to 60L).map(i => i -> s"stable text number $i"): _*)
    val v2 = corpus((1L to 60L).map { i =>
      i -> (if (i == 11L) "edited text" else s"stable text number $i")
    }: _*)
    val sel = CorpusDiff.selectiveDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = CorpusDiff.diff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every selected doc agrees with the full diff…
    sel.foreach { case (id, st) => assert(full(id) == st) }
    // …the edit is found…
    assert(sel(11L) == "modified")
    // …and clean shards were skipped: strictly fewer docs than the corpus
    assert(sel.size < 60 && sel.size >= 1)
    // nothing outside the selected shards changed
    assert(full.filter(_._2 != "unchanged").keySet.subsetOf(sel.keySet))
  }

  test("release manifest checksum is order-free: shuffled input yields identical rows") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val m1 = CorpusDiff.releaseManifest(docs).collect().toSeq
    val m2 = CorpusDiff.releaseManifest(docs.orderBy(rand(7))).collect().toSeq
    assert(m1 == m2)
  }
}
