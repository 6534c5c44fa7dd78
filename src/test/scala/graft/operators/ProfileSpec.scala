package graft.operators

import graft.SparkSpec

/** Profiling invariants + approx-sketch error bound. */
class ProfileSpec extends SparkSpec {

  test("approx distinct within 10% of exact for orders keys") {
    val exact = Profile.q42Profile(spark, sfDirMid).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profile.approxProfile(
      graft.sources.Tables.orders(spark, sfDirMid),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_distinct")).toMap
    exact.foreach { case (c, n) =>
      val a = approx(c)
      assert(math.abs(a - n) <= math.max(1L, n / 10), s"$c: exact=$n approx=$a")
    }
  }

  test("compaction with sort clustering keeps data identical and files sorted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("compact-sorted").toString
    graft.sources.Tables.lineitem(spark, sfDir)
      .withColumn("date", date_format($"l_shipdate", "yyyy-MM-dd"))
      .where($"date" >= "1996-01-01" && $"date" < "1996-01-15")
      .repartition(6, $"date", pmod($"l_orderkey", lit(6)))
      .write.mode("overwrite").partitionBy("date").parquet(dir)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum($"l_quantity".cast("decimal(18,2)"))).head.getDecimal(0)

    // minInputFiles=1 so every partition (even single-file days) is
    // rewritten with the cluster sort.
    val res = Maintenance.compact(spark, dir, "1996-01-01", "1996-01-15",
      targetFileBytes = 1024L * 1024 * 1024, minInputFiles = 1,
      sortCols = Seq("l_orderkey"))
    assert(res.filesAfter < res.filesBefore)

    val after = spark.read.parquet(dir)
    assert(after.agg(sum($"l_quantity".cast("decimal(18,2)"))).head.getDecimal(0) == sumBefore)
    // Every output file is sorted by the cluster column.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).flatMap(d => fs.listStatus(d.getPath))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = spark.read.parquet(f.getPath.toString).select($"l_orderkey")
        .collect().map(_.getLong(0)).toSeq
      assert(keys == keys.sorted, s"${f.getPath} not clustered")
    }
  }
}
