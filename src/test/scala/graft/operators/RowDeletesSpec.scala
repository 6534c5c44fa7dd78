package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MOR deletes must be semantically exact (equality == the NOT EXISTS
  * form, positions remove exactly the addressed rows), NULL-safe where
  * NULL is the only address a row has, sequence-aware so re-inserted
  * keys survive older deletes, and cheap: the anti-join probe must
  * broadcast a small delete file, never shuffle the table. */
class RowDeletesSpec extends SparkSpec {

  import RowDeletes._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("equality MOR equals the NOT EXISTS form") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val deletes = Tables.orders(spark, sfDir)
      .where($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val mor = applyEqualityDeletes(li, deletes, Seq("l_orderkey"))
    val expect = li.join(deletes, Seq("l_orderkey"), "left_anti")
    assert(mor.count() > 0 && mor.count() < li.count())
    assert(sortedRows(mor) == sortedRows(expect))
  }

  test("a NULL delete key matches NULL data keys (null-safe equality)") {
    import spark.implicits._
    val data = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val dels = Seq(Option.empty[Long]).toDF("k")
    val got = applyEqualityDeletes(data, dels, Seq("k"))
      .select($"v").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a", "c"), "the NULL-keyed row must be deleted")
  }

  test("sequence rule: a delete applies only to rows written before it") {
    import spark.implicits._
    val data = Seq((1L, "old", 10L), (1L, "reinserted", 30L), (2L, "keep", 5L))
      .toDF("k", "v", "seq")
    val dels = Seq((1L, 20L)).toDF("k", "dseq")
    val got = applyEqualityDeletes(data, dels, Seq("k"),
      dataSeq = Some("seq"), deleteSeq = Some("dseq"))
      .select($"v").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("keep", "reinserted"),
      "only the pre-delete row of key 1 should be removed")
  }

  test("positional deletes remove exactly the addressed rows across files") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rowdel").toString
    Tables.lineitem(spark, sfDir).repartition(4)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/t")
    val t = spark.read.parquet(s"$root/t")
    val pred = $"l_linestatus" === "F" && $"l_discount" > 0.05
    val dels = positionsOf(t, pred)
    assert(dels.count() > 0)
    val got = applyPositionalDeletes(t, dels)
    val expect = t.where(!coalesce(pred, lit(false)))
    assert(sortedRows(got) == sortedRows(expect))
  }

  test("equality and positional deletes compose on one read") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rowdel-comp").toString
    Tables.lineitem(spark, sfDir).repartition(3)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/t")
    val t = spark.read.parquet(s"$root/t")
    // synthetic lineitem does NOT promise (orderkey, linenumber)
    // uniqueness, so the expectation is stated as the same anti-join
    // semantics, not a per-row predicate
    val eqDels = t.where($"l_returnflag" === "R")
      .select($"l_orderkey").distinct()
    val posDels = positionsOf(t, $"l_quantity" > 45)
    val got = applyEqualityDeletes(
      applyPositionalDeletes(t, posDels),
      eqDels, Seq("l_orderkey"))
    val expect = t.where($"l_quantity" <= 45)
      .join(eqDels, Seq("l_orderkey"), "left_anti")
    assert(got.count() > 0)
    assert(sortedRows(got) == sortedRows(expect))
  }

  test("materialize rewrites the MOR view verbatim and counts both sides") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rowdel-mat").toString
    val li = Tables.lineitem(spark, sfDir)
    val dels = Tables.orders(spark, sfDir).where($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val mor = applyEqualityDeletes(li, dels, Seq("l_orderkey"))
    val (written, deleted) = materialize(mor, li, s"$root/clean")
    assert(written == mor.count())
    assert(deleted == li.count() - mor.count() && deleted > 0)
    assert(sortedRows(spark.read.parquet(s"$root/clean")) == sortedRows(mor))
  }

  test("a small delete file rides a broadcast anti-join, never a table shuffle") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val dels = Tables.orders(spark, sfDir).where($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val phys = applyEqualityDeletes(li, dels, Seq("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      s"equality MOR did not broadcast the delete side:\n$phys")
  }
}
