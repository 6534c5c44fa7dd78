package graft.operators

import java.time.Instant

import graft.SparkSpec
import graft.meta.MetaStore

/** ANALYZE: correct exact stats, slice-replace merge semantics, and a
  * bounded approximate path. */
class AnalyzeSpec extends SparkSpec {

  private def newStore(): MetaStore = {
    val dir = java.nio.file.Files.createTempDirectory("analyze-store").toString
    new MetaStore(spark, dir)
  }

  test("exact stats match hand-computed values and persist") {
    import spark.implicits._
    val store = newStore()
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("a")), (4L, None)
    ).toDF("id", "tag")
    val t0 = Instant.parse("2026-08-12T00:00:00Z")
    val stats = Analyze.analyzeTable(store, "db", "t", df, Seq("id", "tag"), now = t0)
      .sortBy(_.column)
    assert(stats.map(s => (s.column, s.nRows, s.nNull, s.nDistinct)) ==
      Seq(("id", 4L, 0L, 4L), ("tag", 4L, 1L, 2L)))
    assert(stats.head.minValue.contains("1") && stats.head.maxValue.contains("4"))
    assert(stats(1).minValue.contains("a") && stats(1).maxValue.contains("b"))
    val stored = store.columnStats.collect()
    assert(stored.length == 2 && stored.forall(!_.approximate))
  }

  test("re-analyzing replaces only that table's slice") {
    import spark.implicits._
    val store = newStore()
    val df1 = Seq(1L, 2L).toDF("id")
    val df2 = Seq(10L, 20L, 30L).toDF("id")
    Analyze.analyzeTable(store, "db", "t1", df1, Seq("id"))
    Analyze.analyzeTable(store, "db", "t2", df2, Seq("id"))
    Analyze.analyzeTable(store, "db", "t1", df1.union(df1), Seq("id")) // re-run
    val byTable = store.columnStats.collect().groupBy(_.table)
    assert(byTable.keySet == Set("t1", "t2"))
    assert(byTable("t1").head.nRows == 4L) // replaced with the re-run
    assert(byTable("t2").head.nRows == 3L) // untouched
  }

  test("partial-column re-analyze preserves the table's other columns") {
    import spark.implicits._
    val store = newStore()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    Analyze.analyzeTable(store, "db", "t", df, Seq("id", "tag"))
    Analyze.analyzeTable(store, "db", "t", df.union(df), Seq("id")) // refresh one column
    val byCol = store.columnStats.collect().groupBy(_.column)
    assert(byCol.keySet == Set("id", "tag"))
    assert(byCol("id").head.nRows == 4L)  // refreshed
    assert(byCol("tag").head.nRows == 2L) // preserved
  }

  test("approximate path lands near the exact cardinality on real data") {
    val store = newStore()
    val orders = graft.sources.Tables.orders(spark, sfDirMid)
    val approx = Analyze.analyzeTable(store, "db", "orders", orders,
      Seq("o_custkey"), approximate = true).head
    val exact = orders.select("o_custkey").distinct().count()
    assert(approx.approximate)
    assert(math.abs(approx.nDistinct - exact).toDouble / exact < 0.1)
  }
}
