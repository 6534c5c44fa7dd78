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
