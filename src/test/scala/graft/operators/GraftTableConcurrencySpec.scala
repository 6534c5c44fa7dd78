package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SkippingIndex.ColumnRange
import graft.sources.Tables

/** Reader/writer interleaving and cross-store crash seams — the q172
  * class of bug, generalized: maintenance (optimize/vacuum) racing
  * reads (table(), tableAt, changesBetween, readWhere), a commit
  * landing DURING a rewrite, and a crash BETWEEN the delete store's
  * manifest swap and the table-level commit. Every scenario asserts
  * bit-equal results or a refusal — never a silently different
  * answer. */
class GraftTableConcurrencySpec extends SparkSpec {

  import GraftTable._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("gtc-").toString

  private def li: DataFrame = Tables.lineitem(spark, sfDir)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** create + two appends split by orderkey + one erasure batch
    * (commits: 1 create, 2 append b1, 3 append b2, 4 delete). */
  private def build(dir: String): Long = {
    import spark.implicits._
    create(spark, dir, zoneCols = Seq("l_partkey"),
      bloomCols = Seq("l_orderkey"), deleteKeys = Seq("l_orderkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    append(li.where($"l_orderkey" <= mid), dir, "b1")
    append(li.where($"l_orderkey" > mid), dir, "b2")
    delete(Tables.orders(spark, sfDir).where($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey")), dir, "erase-1")
    mid
  }

  test("frames created BEFORE optimize+vacuum return bit-equal results AFTER") {
    import spark.implicits._
    val dir = tmp()
    build(dir)
    // one frame per read surface, all created pre-maintenance
    val t = table(spark, dir)
    val trav = tableAt(spark, dir, 3L)
    val cdc = changesBetween(spark, dir, from = 3L, to = 4L)
    val pruned = readWhere(spark, dir,
      ranges = Seq(ColumnRange("l_partkey", Some(100L), Some(299L))))
    val (tB, travB, cdcB, prunedB) =
      (sortedRows(t), sortedRows(trav), sortedRows(cdc), sortedRows(pruned))
    optimize(spark, dir, "opt-1")
    vacuum(spark, dir)
    // the retained snapshots pin every file the frames resolved:
    // vacuum must not sweep them, retire must not change the pinned
    // delete probe, and the rebuilt index must not re-route the scans
    assert(sortedRows(t) == tB, "table() frame changed across optimize")
    assert(sortedRows(trav) == travB, "tableAt frame changed across optimize")
    assert(sortedRows(cdc) == cdcB,
      "CDC preimage frame changed across optimize (the q172 seam)")
    assert(sortedRows(pruned) == prunedB,
      "readWhere frame changed across optimize")
    // and fresh frames agree with the pre-maintenance table state
    assert(sortedRows(read(spark, dir)) == tB)
  }

  test("optimize ABORTS when a data batch commits during the rewrite; nothing lost") {
    import spark.implicits._
    val dir = tmp()
    val mid = build(dir)
    // deterministic row set: the frame is evaluated twice (append +
    // the expected-rows assertion) and a bare limit() may not repeat
    val extra = li.orderBy($"l_orderkey", $"l_linenumber").limit(100)
      .withColumn("l_orderkey", $"l_orderkey" + 1000000L) // fresh keys
    val before = sortedRows(read(spark, dir))
    val ex = intercept[java.util.ConcurrentModificationException] {
      optimize(spark, dir, "opt-1",
        beforeCommit = () => append(extra, dir, "b3"))
    }
    assert(ex.getMessage.contains("b3"))
    // the abort ABANDONED the rewrite: dir and sidecar both gone — an
    // existing-but-unannounced directory would violate the announce
    // protocol (a vacuum racing the retry could sweep it mid-rewrite)
    assert(!new java.io.File(s"$dir/data/batch=opt-1").exists(),
      "aborted optimize left its rewrite directory behind")
    assert(!new java.io.File(s"$dir/_pending_retire_opt-1.json").exists(),
      "aborted optimize left its announcement standing")
    // no optimize commit was written; the append survives in full
    val man = manifest(spark, dir)
    assert(man.live == Seq("b1", "b2", "b3"))
    assert(!man.applied.contains("opt-1"))
    assert(sortedRows(read(spark, dir)) ==
      (before ++ sortedRows(extra)).sorted)
    // the standing delete was NOT retired (its keys are in no rewrite)
    assert(DeleteStore.manifest(spark, s"$dir/del").live == Seq("erase-1"))
    // the retry against the new state succeeds and changes no answers
    val expect = sortedRows(read(spark, dir))
    optimize(spark, dir, "opt-1")
    vacuum(spark, dir)
    assert(manifest(spark, dir).live == Seq("opt-1"))
    assert(sortedRows(read(spark, dir)) == expect)
  }

  test("a delete committing during the rewrite stays live and applies post-optimize") {
    import spark.implicits._
    val dir = tmp()
    val mid = build(dir)
    val lateKeys = li.where($"l_orderkey" <= mid)
      .select($"l_orderkey").distinct().orderBy($"l_orderkey").limit(5)
    val lateKeySet = lateKeys.collect().map(_.getLong(0)).toSet
    optimize(spark, dir, "opt-1",
      beforeCommit = () => delete(lateKeys, dir, "erase-2"))
    // erase-1 was materialized and retired; erase-2 landed mid-rewrite,
    // is NOT in the rewritten data, and must stay live
    assert(DeleteStore.manifest(spark, s"$dir/del").live == Seq("erase-2"))
    val got = read(spark, dir).select($"l_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(lateKeySet).isEmpty,
      "mid-rewrite delete keys visible after optimize")
    // the optimize commit SNAPSHOT records the mid-rewrite delete, so
    // time travel to it re-applies erase-2 (but never erase-1)
    val optCommit = manifest(spark, dir).commit
    val travKeys = tableAt(spark, dir, optCommit).select($"l_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(travKeys == got)
  }

  test("vacuum during an in-flight optimize must not sweep the announced rewrite dir") {
    import spark.implicits._
    val dir = tmp()
    build(dir)
    val before = sortedRows(read(spark, dir))
    // vacuum fires in the widest window: rewrite dir fully written,
    // commit not yet — without the announcement it would sweep
    // batch=opt-1 as an orphan and the commit would point at nothing
    optimize(spark, dir, "opt-1", beforeCommit = () => {
      vacuum(spark, dir)
      assert(new java.io.File(s"$dir/data/batch=opt-1").exists(),
        "vacuum swept the in-flight rewrite directory")
    })
    assert(manifest(spark, dir).live == Seq("opt-1"))
    assert(sortedRows(read(spark, dir)) == before,
      "optimize+concurrent vacuum changed the table")
  }

  test("vacuum during an in-flight append must not sweep the announced batch dir") {
    import spark.implicits._
    val dir = tmp()
    build(dir)
    val extra = li.orderBy($"l_orderkey", $"l_linenumber").limit(50)
      .withColumn("l_orderkey", $"l_orderkey" + 2000000L)
    val expect = (sortedRows(read(spark, dir)) ++ sortedRows(extra)).sorted
    append(extra, dir, "b3", beforeCommit = () => {
      vacuum(spark, dir)
      assert(new java.io.File(s"$dir/data/batch=b3").exists(),
        "vacuum swept the in-flight append directory")
    })
    assert(sortedRows(read(spark, dir)) == expect,
      "append+concurrent vacuum lost the batch")
  }

  test("a sidecar leaked by a crash AFTER the commit is cleared, not a permanent shield") {
    import spark.implicits._
    val dir = tmp()
    build(dir)
    // simulate the crash window between b1's commitManifest and its
    // clearPending: the label is committed, the announcement stands
    StoreIO.writePending(spark, dir, "append", "b1")
    optimize(spark, dir, "opt-1") // supersedes b1/b2
    expireCommits(spark, dir, keepLast = 1)
    // first vacuum: the sidecar was read into the keep set (announce
    // order), but b1 is provably committed (applied ledger) → cleared
    vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/_pending_append_b1.json").exists(),
      "vacuum left a provably-stale sidecar standing")
    // second vacuum: nothing shields the superseded dir any more
    vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/data/batch=b1").exists(),
      "superseded dir still shielded after the stale sidecar was cleared")
    // replay of the committed label also clears a leaked sidecar
    StoreIO.writePending(spark, dir, "append", "b2")
    append(li.limit(1), dir, "b2") // applied → early-return replay
    assert(!new java.io.File(s"$dir/_pending_append_b2.json").exists(),
      "replay of a committed label left its sidecar standing")
  }

  test("a crash-leaked DELETE-STORE sidecar of a committed label is cleared by table vacuum") {
    import spark.implicits._
    val dir = tmp()
    build(dir) // erase-1 committed in the delete store
    // simulate the crash window between DeleteStore.append's manifest
    // swap and its un-announce: label committed, announcement standing.
    // Nothing in the table lifecycle runs DeleteStore.vacuum, so only
    // the table vacuum's del sweep can ever clear this.
    StoreIO.writePending(spark, s"$dir/del", "append", "erase-1")
    optimize(spark, dir, "opt-1") // materializes + retires erase-1
    expireCommits(spark, dir, keepLast = 1) // drop snapshots pinning it
    // first vacuum: the sidecar was in the keep set (announce-order
    // read), but erase-1 is provably committed (store ledger) → cleared
    vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/del/_pending_append_erase-1.json")
      .exists(), "table vacuum left a provably-stale delete-store sidecar")
    // second vacuum: nothing shields the retired delete dir any more
    vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/del/deletes/batch=erase-1").exists(),
      "retired delete dir still shielded after its stale sidecar cleared")
  }

  test("the commit-slot CAS: an in-flight occupant aborts the claim; a dead orphan is overwritten") {
    import spark.implicits._
    val dir = tmp()
    create(spark, dir, zoneCols = Seq("l_partkey"))
    append(li.where($"l_orderkey" % 2 === 0), dir, "b1") // commit 2
    val extra = li.orderBy($"l_orderkey", $"l_linenumber").limit(30)
      .withColumn("l_orderkey", $"l_orderkey" + 5000000L)
    // occupy slot c3 with an IN-FLIGHT foreign commit: snapshot written,
    // pointer not yet swapped, announcement standing — the exact window
    // where last-swap-wins would erase one writer's label
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_commits/c3.json"),
      """{"commit":3,"applied":["b1","zz"],"live":["b1","zz"],""" +
        """"kind":"append","label":"zz","rows":1,"delLive":[],"retired":[]}""")
    StoreIO.writePending(spark, dir, "append", "zz")
    val ex = intercept[java.util.ConcurrentModificationException] {
      append(extra, dir, "b3")
    }
    assert(ex.getMessage.contains("zz"))
    assert(manifest(spark, dir).commit == 2L, "CAS loser swapped anyway")
    assert(!new java.io.File(s"$dir/data/batch=b3").exists(),
      "CAS loser left its batch directory behind")
    assert(!new java.io.File(s"$dir/_pending_append_b3.json").exists(),
      "CAS loser left its announcement standing")
    // the occupant's writer dies and its label is never replayed: once
    // its announcement is gone the snapshot is a DEAD orphan — the next
    // claim overwrites it and the table moves on
    StoreIO.clearPending(spark, dir, "append", "zz")
    append(extra, dir, "b3")
    val c3 = commitAt(spark, dir, 3L)
    assert(c3.kind == "append" && c3.label == "b3",
      "dead orphan was not overwritten by the next claim")
    assert(manifest(spark, dir).live == Seq("b1", "b3"))
  }

  test("two appends racing from real threads both land after one retry (CAS converges)") {
    import spark.implicits._
    val dir = tmp()
    create(spark, dir, zoneCols = Seq("l_partkey"))
    append(li.where($"l_orderkey" % 2 === 0), dir, "b1")
    val a = li.orderBy($"l_orderkey", $"l_linenumber").limit(40)
      .withColumn("l_orderkey", $"l_orderkey" + 6000000L)
    val b = li.orderBy($"l_orderkey", $"l_linenumber").limit(20)
      .withColumn("l_orderkey", $"l_orderkey" + 7000000L)
    val gate = new java.util.concurrent.CountDownLatch(2)
    def appendWithRetry(df: org.apache.spark.sql.DataFrame,
        label: String): Unit = {
      gate.countDown(); gate.await() // maximize overlap
      var done = false
      var tries = 0
      while (!done) {
        try { append(df, dir, label); done = true }
        catch {
          case _: java.util.ConcurrentModificationException =>
            tries += 1; assert(tries <= 5, s"$label livelocked")
        }
      }
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(appendWithRetry(a, "rA"))
    val fb = Future(appendWithRetry(b, "rB"))
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    // whatever the interleaving, the converged state holds BOTH labels
    // exactly once, a parseable commit chain, and the full row set
    val man = manifest(spark, dir)
    assert(man.applied.count(_ == "rA") == 1)
    assert(man.applied.count(_ == "rB") == 1)
    assert(man.live.toSet == Set("b1", "rA", "rB"))
    val expect = (sortedRows(li.where($"l_orderkey" % 2 === 0)) ++
      sortedRows(a) ++ sortedRows(b)).sorted
    assert(sortedRows(read(spark, dir)) == expect,
      "racing appends lost or duplicated rows")
    (1L to man.commit).foreach(c => commitAt(spark, dir, c)) // parseable
  }

  test("a commit snapshot orphaned ABOVE the pointer does not satisfy the delete replay") {
    import spark.implicits._
    val dir = tmp()
    create(spark, dir, zoneCols = Seq("l_partkey"),
      bloomCols = Seq("l_orderkey"), deleteKeys = Seq("l_orderkey"))
    append(li, dir, "b1") // commit 2
    val keys = li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").limit(3)
    intercept[RuntimeException] {
      delete(keys, dir, "erase-1",
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    // simulate the worst replay environment: a commitManifest that died
    // BETWEEN its snapshot write and its pointer swap left an orphan
    // c3 with the right kind+label — visible to listCommits, invisible
    // to manifest.commit. The replay must not count it as done.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_commits"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_commits/c3.json"),
      """{"commit":3,"applied":["b1"],"live":["b1"],""" +
        """"kind":"delete","label":"erase-1","delLive":["erase-1"],""" +
        """"retired":[]}""")
    assert(manifest(spark, dir).commit == 2L)
    delete(keys, dir, "erase-1") // replay
    val man = manifest(spark, dir)
    assert(man.commit == 3L, "replay did not repair the lost table commit")
    assert(commitAt(spark, dir, 3L).kind == "delete")
    // the CDC window sees the delete exactly once
    val w = changesBetween(spark, dir, 2L, 3L)
    assert(w.where($"_change_type" === "delete").count() > 0)
  }

  test("delete() crash between the delete-store commit and the table commit converges on replay") {
    import spark.implicits._
    val dir = tmp()
    create(spark, dir, zoneCols = Seq("l_partkey"),
      bloomCols = Seq("l_orderkey"), deleteKeys = Seq("l_orderkey"))
    append(li, dir, "b1") // commit 2
    val mirror = tmp()
    syncMirror(spark, dir, mirror) // baseline at commit 2
    val keys = li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").limit(3)
    intercept[RuntimeException] {
      delete(keys, dir, "erase-1",
        beforeCommit = () => throw new RuntimeException("crash"))
    }
    // the bad interim state the sidecar exists to repair: the delete
    // store applied the label, the table-level commit is missing
    assert(DeleteStore.manifest(spark, s"$dir/del").applied == Seq("erase-1"))
    assert(manifest(spark, dir).commit == 2L)
    // replay with the same label: the pending sidecar writes the
    // missing kind=delete commit exactly once
    delete(keys, dir, "erase-1")
    val man = manifest(spark, dir)
    assert(man.commit == 3L)
    assert(commitAt(spark, dir, 3L).kind == "delete")
    assert(commitAt(spark, dir, 3L).label == "erase-1")
    assert(!new java.io.File(s"$dir/_pending_delete_erase-1.json").exists())
    // a further replay commits nothing more
    delete(keys, dir, "erase-1")
    assert(manifest(spark, dir).commit == 3L)
    // the CDC window now SEES the delete, and the mirror converges
    val w = changesBetween(spark, dir, 2L, 3L)
    assert(w.where($"_change_type" === "delete").count() > 0,
      "repaired delete commit missing from the CDC feed")
    syncMirror(spark, dir, mirror)
    assert(sortedRows(mirrorRead(spark, mirror)) ==
      sortedRows(read(spark, dir)),
      "mirror diverged from read() after the crash-replay repair")
  }
}
