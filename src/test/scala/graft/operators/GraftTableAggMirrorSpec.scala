package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Incremental view maintenance ([[GraftTable.syncAggMirror]]): the
  * signed-delta merge must equal a from-scratch re-aggregation after
  * ANY window of appends and deletes, zero-count groups must vanish
  * (never linger as zero rows), and a sync with nothing new must be a
  * no-op. The oracle (q176) pins the values; these pin the contract's
  * edges. */
class GraftTableAggMirrorSpec extends SparkSpec {

  import GraftTable._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("gt-ivm-").toString

  private def li: DataFrame = Tables.lineitem(spark, sfDir)

  private def rows(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  private val keys = Seq("l_returnflag")
  private val sums = Seq("l_quantity")

  private def scratch(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    read(spark, dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,2)"))
          .cast("decimal(28,2)").as("sum_l_quantity"))

  test("steady-state delta merges equal the from-scratch aggregate after every sync") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    append(li.where($"l_orderkey" <= mid), dir, "b1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums) // baseline
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)))
    // window 1: an append alone
    append(li.where($"l_orderkey" > mid), dir, "b2")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)), "insert-only delta diverged")
    // window 2: a delete alone (erase some keys)
    delete(li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").limit(7), dir, "e1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)), "delete-only delta diverged")
    // a sync with nothing new is a no-op (pointer unchanged)
    val (from, to) = syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(from == to)
  }

  test("a group erased to zero rows vanishes from the view (no zero-count rows)") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    append(li, dir, "b1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums) // baseline
    // erase EVERY row of one return flag
    val victims = li.where($"l_returnflag" === "R")
      .select($"l_orderkey").distinct()
    delete(victims, dir, "purge-R")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    val view = aggMirrorRead(spark, s"$root/agg")
    assert(view.where($"l_returnflag" === "R").count() == 0,
      "a fully-erased group lingered in the view")
    assert(rows(view) == rows(scratch(spark, dir)))
  }

  // ---- min/max maintenance (per-group repair, never a full rescan) ---

  private val mm = Seq("l_extendedprice")

  private def scratchMM(dir: String): DataFrame =
    read(spark, dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,2)"))
          .cast("decimal(28,2)").as("sum_l_quantity"),
        min(col("l_extendedprice")).as("min_l_extendedprice"),
        max(col("l_extendedprice")).as("max_l_extendedprice"))

  test("min/max IVM: insert-only windows rescan nothing; a deleted extremum repairs ONLY its groups") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    append(li.where($"l_orderkey" <= mid), dir, "b1")
    var seamCalls = 0
    var seamRows = -1L
    def sync(): Unit = {
      syncAggMirror(spark, dir, s"$root/agg", keys, sums, mm, mm,
        repairSeam = df => { seamCalls += 1; seamRows = df.count() })
      ()
    }
    sync() // baseline (a full aggregation, but not a "repair")
    assert(seamCalls == 0)
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratchMM(dir)), "baseline min/max diverged")
    // window 1: INSERT-ONLY — folding with least/greatest needs no
    // table access; the eager dirty check must skip the rescan branch
    append(li.where($"l_orderkey" > mid), dir, "b2")
    sync()
    assert(seamCalls == 0, "insert-only window planned a repair rescan")
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratchMM(dir)), "insert-only min/max fold diverged")
    // window 2: delete the orderkey holding group R's MAX price — the
    // repair must rescan exactly the groups whose stored extremum the
    // preimages reached, and nothing else
    val at3 = read(spark, dir)
    val stored = at3.groupBy($"l_returnflag")
      .agg(min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val victim = at3.where($"l_returnflag" === "R")
      .orderBy($"l_extendedprice".desc, $"l_orderkey").limit(1)
      .select($"l_orderkey").head().getLong(0)
    val pre = at3.where($"l_orderkey" === victim)
    // the test's own dirty rule, computed from DATA (<=/>= — the same
    // conservative trigger the merge uses)
    val dirtyGroups = pre.groupBy($"l_returnflag")
      .agg(min($"l_extendedprice").as("dmn"), max($"l_extendedprice").as("dmx"))
      .collect().filter { r =>
        val (mn, mx) = stored(r.getString(0))
        r.getDouble(1) <= mn || r.getDouble(2) >= mx
      }.map(_.getString(0)).toSet
    assert(dirtyGroups.contains("R"), "test setup: R's max must be deleted")
    delete(pre.select($"l_orderkey").distinct(), dir, "e1")
    sync()
    assert(seamCalls == 1, "deleted extremum did not trigger a repair")
    val expectRows = read(spark, dir)
      .where($"l_returnflag".isin(dirtyGroups.toSeq: _*)).count()
    assert(seamRows == expectRows,
      s"repair rescanned $seamRows rows, expected exactly the " +
        s"${dirtyGroups.size} dirty group(s) = $expectRows rows")
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratchMM(dir)), "post-repair min/max diverged")
    // window 3: delete rows that are NO group's extremum — no repair
    val safe = read(spark, dir)
      .groupBy($"l_orderkey").agg(min($"l_extendedprice").as("mn"),
        max($"l_extendedprice").as("mx"))
      .join(read(spark, dir).groupBy($"l_returnflag")
        .agg(min($"l_extendedprice").as("gmn"),
          max($"l_extendedprice").as("gmx")).agg(
          max($"gmn").as("anyMn"), min($"gmx").as("anyMx")))
      .where($"mn" > $"anyMn" && $"mx" < $"anyMx")
      .select($"l_orderkey").orderBy($"l_orderkey").limit(3)
    if (safe.count() > 0) {
      delete(safe, dir, "e2")
      sync()
      assert(seamCalls == 1, "a non-extremum delete triggered a repair")
      assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
        rows(scratchMM(dir)), "non-extremum delete window diverged")
    }
  }

  test("min/max IVM: syncing with a different column set fails loudly, never silently drifts") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    append(li.where($"l_orderkey" <= mid), dir, "b1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums) // no min/max
    append(li.where($"l_orderkey" > mid), dir, "b2")
    val e = intercept[IllegalArgumentException] {
      syncAggMirror(spark, dir, s"$root/agg", keys, sums, mm, mm)
    }
    assert(e.getMessage.contains("min_l_extendedprice"))
  }

  test("a reader holding the superseded version survives one sync (keepLast retention)") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    append(li.where($"l_orderkey" <= mid), dir, "b1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    val preScratch = rows(scratch(spark, dir))
    val held = aggMirrorRead(spark, s"$root/agg") // resolves v2's files
    // a sync commits v3 while the reader's frame is outstanding: with
    // keepLast=1 (default) v2 must survive the sweep and the held scan
    // completes against the state it resolved
    append(li.where($"l_orderkey" > mid), dir, "b2")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(rows(held) == preScratch,
      "held frame broke (or drifted) across a concurrent sync commit")
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)), "fresh read does not see the new sync")
  }

  test("a CDC consumer driven from the ingest stream is exactly-once across epochs and replays") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    create(spark, dir, zoneCols = Seq("l_partkey"))
    val mid = li.agg(max($"l_orderkey")).head().getLong(0) / 2
    li.where($"l_orderkey" <= mid).coalesce(1).write.parquet(s"$src/c1")
    li.where($"l_orderkey" > mid).coalesce(1).write.parquet(s"$src/c2")
    var syncs = 0
    // the packaged composition: one committed append per micro-batch,
    // the aggregate view synced from the commit log after each epoch —
    // the streaming twin of the q176 consumer, exactly-once end to end
    ingestStream(
      spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$src/c*"),
      dir, ckpt,
      afterAppend = _ => {
        syncAggMirror(spark, dir, s"$root/agg", keys, sums)
        syncs += 1
      }).awaitTermination()
    assert(syncs == 2, s"expected one sync per epoch, got $syncs")
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)),
      "stream-driven view diverged from the table aggregate")
    // a replayed epoch (at-least-once delivery) is absorbed by the
    // label ledger AND by the sync pointer: nothing double-counts
    append(spark.read.parquet(s"$src/c2"), dir, "epoch-1")
    val (from, to) = syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(from == to, "a replayed epoch advanced the view")
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)))
  }

  test("an optimize in the window re-baselines and still matches from-scratch") {
    import spark.implicits._
    val root = tmp()
    val dir = s"$root/t"
    create(spark, dir, zoneCols = Seq("l_partkey"),
      deleteKeys = Seq("l_orderkey"))
    append(li, dir, "b1")
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    delete(li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").limit(5), dir, "e1")
    optimize(spark, dir, "opt-1") // no exact delta exists now
    syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    assert(rows(aggMirrorRead(spark, s"$root/agg")) ==
      rows(scratch(spark, dir)), "re-baseline across optimize diverged")
  }
}
