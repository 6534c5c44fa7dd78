package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SkippingIndex
import graft.sources.{Tables => T}

/** The transparent skipping scan must be a drop-in for
  * `spark.read.parquet(table)`: same rows under EVERY predicate shape
  * (supported, unsupported, none), while predicates the index CAN
  * answer measurably shrink the executed scan's file set — without the
  * caller restating anything. */
class SkippingScanSpec extends SparkSpec {

  import SkippingIndex.build

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** lineitem range-clustered by partkey (8 files), zone-indexed on
    * partkey and bloom-indexed on orderkey. */
  private def clustered(root: String): String = {
    import spark.implicits._
    T.lineitem(spark, sfDir)
      .repartitionByRange(8, $"l_partkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$root/table")
    build(spark, s"$root/table", s"$root/index",
      cols = Seq("l_partkey"), bloomCols = Seq("l_orderkey"))
    s"$root/index"
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Executed-scan file count, through the AQE wrappers if present.
    * Must run on a df's FIRST execution: numFiles is a driver-side
    * metric set when the lazy selectedPartitions materializes, and a
    * re-execution resets it without re-posting. */
  private def filesRead(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("unfiltered, the transparent scan is the plain table") {
    val root = tmp("tscan-all")
    val idx = clustered(root)
    val got = SkippingScan.table(spark, idx)
    val expect = spark.read.parquet(s"$root/table")
    assert(got.schema == expect.schema)
    assert(sortedRows(got) == sortedRows(expect))
  }

  test("a plain .where on the zone column prunes the executed scan") {
    val root = tmp("tscan-zone")
    val idx = clustered(root)
    val got = SkippingScan.table(spark, idx)
      .where(col("l_partkey").between(40L, 79L))
    val expect = spark.read.parquet(s"$root/table")
      .where(col("l_partkey").between(40L, 79L))
    val n = filesRead(got) // first execution — see filesRead's contract
    assert(n > 0 && n <= 3, s"pushed range read $n of 8 clustered files")
    assert(sortedRows(got) == sortedRows(expect))
    // parquet row-group pruning is preserved: the data filter still
    // reaches the reader as PushedFilters
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(l_partkey,40)"), plan)
  }

  test("a plain equality on the bloom column prunes a scattered key") {
    import spark.implicits._
    val root = tmp("tscan-bloom")
    val idx = clustered(root) // orderkey is scattered across partkey files
    val someKey = spark.read.parquet(s"$root/table")
      .select($"l_orderkey").head().getLong(0)
    val got = SkippingScan.table(spark, idx)
      .where($"l_orderkey" === someKey)
    val expect = spark.read.parquet(s"$root/table")
      .where($"l_orderkey" === someKey)
    // the key's TRUE file spread is layout-dependent (repartitionByRange
    // samples its boundaries, so the spread can vary run to run — a
    // fixed "<= 5" bound flaked at spread 4 + 2 FPs); assert against
    // the measured spread plus a small false-positive allowance, and
    // that pruning actually happened
    val spread = spark.read.parquet(s"$root/table")
      .where($"l_orderkey" === someKey)
      .select(input_file_name()).distinct().count()
    val n = filesRead(got)
    assert(n < 8, s"bloom equality pruned nothing ($n of 8 files)")
    assert(n <= spread + 2,
      s"bloom equality read $n files for a key spread over $spread")
    assert(sortedRows(got) == sortedRows(expect))
    assert(got.count() > 0)
  }

  test("IN-lists and strict bounds translate; strictness is preserved by the scan") {
    import spark.implicits._
    val root = tmp("tscan-shapes")
    val idx = clustered(root)
    val table = spark.read.parquet(s"$root/table")
    // strict bounds widen to an inclusive PRUNE but filter exactly
    val strict = SkippingScan.table(spark, idx)
      .where($"l_partkey" > 40L && $"l_partkey" < 43L)
    assert(filesRead(strict) <= 2)
    assert(sortedRows(strict) == sortedRows(
      table.where($"l_partkey" > 40L && $"l_partkey" < 43L)))
    assert(strict.select(min($"l_partkey"), max($"l_partkey")).collect()
      .head.toSeq == Seq(41L, 42L))
    // IN on the bloom column
    val keys = table.select($"l_orderkey").distinct().limit(2)
      .collect().map(_.getLong(0)).toSeq
    val inq = SkippingScan.table(spark, idx)
      .where($"l_orderkey".isin(keys: _*))
    assert(sortedRows(inq) == sortedRows(
      table.where($"l_orderkey".isin(keys: _*))))
    assert(inq.count() > 0)
  }

  test("unsupported predicates read everything but never lose rows") {
    import spark.implicits._
    val root = tmp("tscan-unsup")
    val idx = clustered(root)
    val table = spark.read.parquet(s"$root/table")
    // unindexed column, expression over the column, disjunction across
    // columns: none can prune; all must stay exact
    for (pred <- Seq(
      $"l_suppkey" === 3L,
      $"l_partkey" + 1L === 42L,
      $"l_partkey" === 5L || $"l_suppkey" === 3L)) {
      val got = SkippingScan.table(spark, idx).where(pred)
      assert(sortedRows(got) == sortedRows(table.where(pred)),
        s"mismatch under $pred")
      assert(filesRead(SkippingScan.table(spark, idx).where(pred)) == 8,
        s"$pred should not prune")
    }
  }

  test("pushed IS [NOT] NULL prunes all-NULL and no-NULL files transparently") {
    import spark.implicits._
    val root = tmp("tscan-null")
    Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("id", "k")
      .coalesce(1).write.parquet(s"$root/table")
    Seq((3L, Some(5L)), (4L, Some(9L))).toDF("id", "k")
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$root/table")
    SkippingIndex.build(spark, s"$root/table", s"$root/index", Seq("k"))
    val notNull = SkippingScan.table(spark, s"$root/index")
      .where($"k".isNotNull)
    assert(filesRead(notNull) == 1, "the all-NULL file must be skipped")
    assert(notNull.select(sum($"k")).collect().head.getLong(0) == 14L)
    val isNull = SkippingScan.table(spark, s"$root/index")
      .where($"k".isNull)
    assert(filesRead(isNull) == 1, "the no-NULL file must be skipped")
    assert(isNull.count() == 2)
    // and the IsNotNull Spark pushes ALONGSIDE a comparison composes
    // with the comparison's own zone prune
    val both = SkippingScan.table(spark, s"$root/index")
      .where($"k" >= 6L)
    assert(filesRead(both) == 1)
    assert(both.select(sum($"k")).collect().head.getLong(0) == 9L)
  }

  test("files appended after the build are read conservatively, then prune after refresh") {
    import spark.implicits._
    val root = tmp("tscan-append")
    val idx = clustered(root)
    // rows inside the probe band, in a file the index has never seen
    T.lineitem(spark, sfDir).where($"l_partkey".between(40L, 79L))
      .limit(50).coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/table")
    val pred = col("l_partkey").between(40L, 79L)
    val got = SkippingScan.table(spark, idx).where(pred)
    val expect = spark.read.parquet(s"$root/table").where(pred)
    assert(sortedRows(got) == sortedRows(expect))
    assert(SkippingIndex.refresh(spark, idx) == 1)
    assert(sortedRows(SkippingScan.table(spark, idx).where(pred)) ==
      sortedRows(expect))
  }

  test("aggregations ride the pruned scan end to end") {
    import spark.implicits._
    val root = tmp("tscan-agg")
    val idx = clustered(root)
    val got = SkippingScan.table(spark, idx)
      .where($"l_partkey".between(40L, 79L))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
    val expect = spark.read.parquet(s"$root/table")
      .where($"l_partkey".between(40L, 79L))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
    assert(filesRead(got) <= 3)
    assert(got.collect().toSeq == expect.collect().toSeq)
  }
}
