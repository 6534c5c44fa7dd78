package graft.operators

import graft.SparkSpec

/** S1/S2/S4 over the live Spark catalog using registered temp views. */
class CatalogOpsSpec extends SparkSpec {

  test("listDatabases includes default and is sorted") {
    val dbs = CatalogOps.listDatabases(spark)
    assert(dbs.contains("default"))
    assert(dbs == dbs.sorted)
  }

  test("describeTable renders nested types recursively") {
    import spark.implicits._
    Seq((1, ("a", Seq(1, 2)), Map("k" -> 1.0)))
      .toDF("id", "nested", "m")
      .createOrReplaceTempView("cat_ops_nested")
    val cols = CatalogOps.describeTable(spark, "cat_ops_nested")
    assert(cols.map(_.name) == Seq("id", "nested", "m"))
    assert(cols(1).`type` == "struct<_1:string,_2:array<int>>")
    assert(cols(2).`type` == "map<string,double>")
  }

  test("typed small-file Aggregator matches the column-expression scoring") {
    import spark.implicits._
    import org.apache.spark.sql.functions
    val agg = functions.udaf(new graft.functions.SmallFileAggregator(256L, 2, 25))
    spark.udf.register("needs_optimize_udaf", agg)
    val files = Seq(
      ("p1", 32L), ("p1", 64L), ("p1", 300L), ("p1", 320L),
      ("p2", 300L), ("p2", 320L), ("p2", 32L)
    ).toDF("part", "size")
    val out = files.groupBy($"part")
      .agg(functions.expr("needs_optimize_udaf(size)").as("flag"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("p1" -> true, "p2" -> false))
    // parity with the pure-Scala rule
    assert(graft.meta.SmallFiles.needsOptimize(Seq(32, 64, 300, 320),
      Map("tenant" -> "x"),
      graft.meta.SmallFiles.Config(256, 2, 25, 24), java.time.Instant.now()))
  }
}
