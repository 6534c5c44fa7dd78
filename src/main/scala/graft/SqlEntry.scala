package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.meta.{PartitionModel, SmallFiles}

/** SQL entry point — the BASELINE "Spark SQL for metadata queries"
  * surface: registers the TESTDATA tables and derived metadata as temp
  * views plus the engine's scalar/aggregate functions, so every
  * capability is reachable from `spark.sql(...)` as well as the
  * DataFrame API.
  */
object SqlEntry {

  /** Register the raw tables and the derived `files` metadata view. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.sources.Tables.names.foreach { name =>
      graft.sources.Tables.load(spark, sfDir, name).createOrReplaceTempView(name)
    }
    graft.meta.MetaDerive.files(spark, sfDir).createOrReplaceTempView("meta_files")
    graft.meta.MetaDerive.partitionStats(spark, sfDir)
      .createOrReplaceTempView("meta_partitions")
  }

  /** Register engine functions for SQL callers:
    *  - partition_to_date(year, month, day): mixed-padding-tolerant
    *    date assembly (reference F2)
    *  - partition_string(map): canonical `{k=v, …}` rendering (F9)
    *  - needs_optimize(size): small-file UDAF with reference defaults
    *    at test scale (A7 / §2.11)
    */
  def registerFunctions(spark: SparkSession,
      cfg: SmallFiles.Config = graft.meta.MetaDerive.cfg): Unit = {
    // null-in → null-out, the SQL contract (a raw NPE inside a UDF
    // fails the whole query on the first NULL row)
    spark.udf.register("partition_to_date",
      (y: String, m: String, d: String) =>
        if (y == null || m == null || d == null) null
        else PartitionModel.partitionDate(Map("year" -> y, "month" -> m, "day" -> d))
          .map(java.sql.Date.valueOf).orNull)
    spark.udf.register("partition_string",
      (m: Map[String, String]) =>
        if (m == null) null else PartitionModel.canonicalString(m))
    spark.udf.register("partition_string_browse",
      (m: Map[String, String], selected: Seq[String]) =>
        if (m == null || selected == null) null
        else PartitionModel.renderOrdered(m, selected))
    spark.udf.register("needs_optimize", F.udaf(
      new graft.functions.SmallFileAggregator(cfg.thresholdBytes, cfg.minCount,
        cfg.minSharePercent)))
    // native codegen expressions (not UDFs) — registry-level
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.NormalizeNfc.register(spark)
  }

  /** A1 table summary as pure SQL over the registered views —
    * demonstrates the SQL path end-to-end. */
  def tableSummarySql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    registerFunctions(spark)
    spark.sql(
      """SELECT count(*) AS partition_count,
        |       coalesce(sum(file_count), 0) AS file_count,
        |       coalesce(sum(record_count), 0) AS record_count,
        |       CAST(coalesce(sum(total_size), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_size,
        |       coalesce(max(needs_optimize), false) AS needs_optimize
        |FROM meta_partitions""".stripMargin)
  }

  /** needs_optimize via the registered UDAF in SQL, grouped per
    * partition over the files view. */
  def needsOptimizeSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    registerFunctions(spark)
    spark.sql(
      """SELECT year, month, day, needs_optimize(file_size) AS flagged
        |FROM meta_files WHERE content = 0
        |GROUP BY year, month, day
        |ORDER BY year, month, day""".stripMargin)
  }
}
