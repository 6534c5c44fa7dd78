package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.MetaDerive

/** Metadata-engine query surface (SURVEY.md §2 rows S6-S8, A1, A3, A7,
  * J2, O1/O3/O4, F3/F9/F16) over the deterministic derived metadata of
  * [[MetaDerive]]. Every query here has an exact DuckDB oracle built on
  * the same CTE derivation.
  *
  * Scale notes: all plans are scan → single hash-aggregate (map-side
  * partial) → small result; the anti-join shuffles once on file_path; at
  * 100 TB the `files` input is the Iceberg `.files` metadata table which
  * is itself partition-pruned by (database, table).
  */
object Metadata {

  /** S6+A3+A7: per-partition file stats with needs_optimize scoring. */
  def q11PartitionStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    MetaDerive.partitionStats(spark, d)
      .select($"year", $"month", $"day", $"record_count", $"file_count",
        $"total_size".cast("double").as("total_size"), $"small_count", $"needs_optimize")
      .orderBy($"year", $"month", $"day")
  }

  val q11Sql: String = MetaDerive.partitionStatsCte +
    """
      |SELECT year, month, day, CAST(record_count AS BIGINT) AS record_count,
      |       file_count, CAST(total_size AS DOUBLE) AS total_size,
      |       small_count, needs_optimize
      |FROM scored ORDER BY year, month, day""".stripMargin

  /** A1 table summary: COUNT/SUM/COALESCE/MAX over partition stats
    * (reference service_metadata.go:36-66). */
  def q12TableSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    MetaDerive.partitionStats(spark, d)
      .agg(
        count(lit(1)).as("partition_count"),
        coalesce(sum($"file_count"), lit(0L)).as("file_count"),
        coalesce(sum($"record_count"), lit(0L)).as("record_count"),
        coalesce(sum($"total_size"), lit(0).cast("decimal(18,2)")).cast("double").as("total_size"),
        coalesce(max($"needs_optimize"), lit(false)).as("needs_optimize"))
  }

  val q12Sql: String = MetaDerive.partitionStatsCte +
    """
      |SELECT count(*) AS partition_count,
      |       CAST(coalesce(sum(file_count), 0) AS BIGINT) AS file_count,
      |       CAST(coalesce(sum(record_count), 0) AS BIGINT) AS record_count,
      |       CAST(coalesce(sum(total_size), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_size,
      |       coalesce(max(needs_optimize), false) AS needs_optimize
      |FROM scored""".stripMargin

  /** S8+O1+P6+F9: files browse for one selected partition month —
    * content=0 filter, *selection-order* `{k=v}` partition rendering
    * (the keys the user drilled into — year, month — render first in
    * selection order, remaining keys alphabetically:
    * service_browse_files.go:300-333), ORDER BY size DESC, path ASC
    * (service_browse_files.go:193-215). */
  def q13FilesBrowse(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // Key order comes from the shared F9 rule; the render itself is a
    // codegen'd concat (no UDF in the scan-wide projection).
    val keys = graft.meta.PartitionModel.browseKeyOrder(
      Set("year", "month", "day"), selectedOrder = Seq("year", "month"))
    val rendered = concat(
      lit("{") +: keys.zipWithIndex.flatMap { case (k, i) =>
        val sep = if (i == 0) Seq.empty else Seq(lit(", "))
        sep ++ Seq(lit(s"$k="), coalesce(col(k), lit("null")))
      } :+ lit("}"): _*)
    MetaDerive.files(spark, d)
      .where($"content" === 0 && $"year" === "1996" && $"month" === "03")
      .withColumn("partition", rendered)
      .select($"file_path", $"file_format", $"partition", $"record_count",
        $"file_size".cast("double").as("file_size"))
      .orderBy($"file_size".desc, $"file_path".asc)
  }

  val q13Sql: String = MetaDerive.filesCte +
    """
      |SELECT file_path, file_format,
      |       '{year=' || year || ', month=' || month || ', day=' || day || '}' AS partition,
      |       record_count, CAST(file_size AS DOUBLE) AS file_size
      |FROM files WHERE content = 0 AND year = '1996' AND month = '03'
      |ORDER BY file_size DESC, file_path ASC""".stripMargin

  /** J2+S11: missing-file integrity check — expected file keys minus a
    * simulated object-store listing (every file-3 of day 15 "lost") →
    * left_anti (reference service_file_integrity.go:62-75). */
  def q14MissingFiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val expected = MetaDerive.files(spark, d).select($"file_path", $"file_id", $"day")
    val listed = expected.where(!($"file_id" === 3 && $"day" === "15")).select($"file_path")
    expected.join(listed, Seq("file_path"), "left_anti")
      .select($"file_path")
      .orderBy($"file_path")
  }

  val q14Sql: String = MetaDerive.filesCte +
    """
      |SELECT file_path FROM files
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM files l
      |  WHERE NOT (l.file_id = 3 AND l.day = '15') AND l.file_path = files.file_path)
      |ORDER BY file_path""".stripMargin

  /** F3+P4+O6: the EnqueueOptimize planning query — needs_optimize
    * partitions within a date range via CONCAT/LPAD date assembly,
    * ordered by the assembled date (reference service_tasks.go:233-254). */
  def q15OptimizeCandidates(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val datePath = concat($"year", lit("-"), lpad($"month", 2, "0"),
      lit("-"), lpad($"day", 2, "0"))
    MetaDerive.partitionStats(spark, d)
      .where($"needs_optimize" === true)
      .withColumn("date_path", datePath)
      .where($"date_path" >= "1996-01-01" && $"date_path" <= "1997-12-31")
      .select($"year", $"month", $"day", $"date_path", $"file_count", $"small_count")
      .orderBy($"date_path")
  }

  val q15Sql: String = MetaDerive.partitionStatsCte +
    """
      |SELECT year, month, day,
      |       year || '-' || lpad(month, 2, '0') || '-' || lpad(day, 2, '0') AS date_path,
      |       file_count, small_count
      |FROM scored
      |WHERE needs_optimize
      |  AND year || '-' || lpad(month, 2, '0') || '-' || lpad(day, 2, '0') >= '1996-01-01'
      |  AND year || '-' || lpad(month, 2, '0') || '-' || lpad(day, 2, '0') <= '1997-12-31'
      |ORDER BY date_path""".stripMargin

  /** F16: S3 URI parsing — scheme/bucket/key extraction + per-prefix file
    * counts (reference service_file_integrity.go:155-192). */
  def q16S3Parse(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val uriRe = "^(s3a?n?)://([^/]+)/(.*)$"
    MetaDerive.files(spark, d)
      .withColumn("scheme", regexp_extract($"file_path", uriRe, 1))
      .withColumn("bucket", regexp_extract($"file_path", uriRe, 2))
      .withColumn("key", regexp_extract($"file_path", uriRe, 3))
      .withColumn("table_prefix", regexp_extract($"key", "^([^/]+/[^/]+)/", 1))
      .groupBy($"scheme", $"bucket", $"table_prefix")
      .agg(count(lit(1)).as("n_files"), min($"key").as("first_key"))
      .orderBy($"scheme", $"bucket", $"table_prefix")
  }

  val q16Sql: String = MetaDerive.filesCte +
    """
      |SELECT regexp_extract(file_path, '^(s3a?n?)://([^/]+)/(.*)$', 1) AS scheme,
      |       regexp_extract(file_path, '^(s3a?n?)://([^/]+)/(.*)$', 2) AS bucket,
      |       regexp_extract(regexp_extract(file_path, '^(s3a?n?)://([^/]+)/(.*)$', 3),
      |                      '^([^/]+/[^/]+)/', 1) AS table_prefix,
      |       count(*) AS n_files,
      |       min(regexp_extract(file_path, '^(s3a?n?)://([^/]+)/(.*)$', 3)) AS first_key
      |FROM files GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** O3: claim-oldest-queued analog — earliest event of a kind-set with a
    * deterministic tiebreak (reference service_task_queue.go:271). */
  def q17ClaimOldest(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.events(spark, d)
      .where($"event_type".isin("click", "view"))
      .select($"event_id", $"user_id", $"event_type",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy($"ts_s".asc, $"event_id".asc)
      .limit(1)
  }

  val q17Sql: String =
    """SELECT event_id, user_id, event_type,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM events WHERE event_type IN ('click', 'view')
      |ORDER BY ts_s ASC, event_id ASC LIMIT 1""".stripMargin

  /** S5 snapshot-pinned file scan: files of one "snapshot generation"
    * → dedup paths, sort (reference iceberg_client.go:124-158; the
    * generation stands in for VERSION AS OF). */
  def q41SnapshotFiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    MetaDerive.files(spark, d)
      .withColumn("snapshot_gen", pmod($"day".cast("int"), lit(3)))
      .where($"snapshot_gen" === 1)
      .select($"file_path").distinct()
      .orderBy($"file_path")
  }

  val q41Sql: String = MetaDerive.filesCte +
    """
      |SELECT DISTINCT file_path FROM files
      |WHERE CAST(day AS INT) % 3 = 1
      |ORDER BY file_path""".stripMargin

  /** P5+F12: JSON-path projection and predicate over a stored JSON
    * document column (the reference's `partition->>'$.key'` access,
    * handler_browse.go:14-21) — extract, filter, bucket and aggregate
    * on the extracted value. */
  def q43JsonPath(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.events(spark, d)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .where($"k".isNotNull && $"k" >= 50)
      .withColumn("k_bucket", floor($"k" / 10).cast("int") * 10)
      .groupBy($"event_type", $"k_bucket")
      .agg(count(lit(1)).as("n"), sum($"k").as("k_total"))
      .orderBy($"event_type", $"k_bucket")
  }

  val q43Sql: String =
    """SELECT event_type, CAST(FLOOR(CAST(props->>'$.k' AS INT) / 10) AS INT) * 10 AS k_bucket,
      |       count(*) AS n, CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_total
      |FROM events
      |WHERE CAST(props->>'$.k' AS INT) >= 50
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q142: FUSED REWRITE ADVISORY — the two rewrite signals ranked
    * together: A7's small-file score (too many sub-threshold files)
    * and q136's clustering quality (key zones overlap, min/max pruning
    * defeated). A partition can need `rewrite_data_files` for either
    * reason — binpack fixes the first, sort/z-order the second — and
    * the advisory names which (`small_files` / `clustering` / `both`),
    * which IS the procedure-argument decision. Top 50 by combined
    * severity, fully tie-broken. Both inputs are bounded partition-grain
    * aggregates; the join key is the partition tuple. */
  def q142RewriteAdvisory(spark: SparkSession, d: String, topN: Int = 50): DataFrame = {
    import spark.implicits._
    val stats = MetaDerive.partitionStats(spark, d)
      .select($"year", $"month", $"day", $"file_count", $"small_count",
        $"needs_optimize")
    val overlap = clusteringSummary(spark, d)
      .select($"year", $"month", $"day", $"n_pairs", $"n_overlap")
    stats.join(overlap, Seq("year", "month", "day"))
      .withColumn("cluster_bad", $"n_overlap" * 2 > $"n_pairs")
      .where($"needs_optimize" || $"cluster_bad")
      .withColumn("reason",
        when($"needs_optimize" && $"cluster_bad", "both")
          .when($"needs_optimize", "small_files")
          .otherwise("clustering"))
      .select($"year", $"month", $"day", $"file_count", $"small_count",
        $"n_overlap", $"n_pairs", $"reason")
      .orderBy(($"small_count" + $"n_overlap").desc, $"year", $"month", $"day")
      .limit(topN)
  }

  def q142Sql(topN: Int = 50): String = MetaDerive.partitionStatsCte +
    """,
      |ranges AS (
      |  SELECT strftime(l_shipdate, '%Y') AS year,
      |         strftime(l_shipdate, '%m') AS month,
      |         strftime(l_shipdate, '%d') AS day,
      |         CAST(l_orderkey % 8 AS INT) AS file_id,
      |         min(l_partkey) AS mn, max(l_partkey) AS mx
      |  FROM lineitem GROUP BY 1, 2, 3, 4
      |), pv AS (
      |  SELECT a.year, a.month, a.day,
      |         CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN a.mn <= b.mx AND b.mn <= a.mx
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      |  FROM ranges a JOIN ranges b
      |    ON a.year = b.year AND a.month = b.month AND a.day = b.day
      |   AND a.file_id < b.file_id
      |  GROUP BY 1, 2, 3
      |), fused AS (
      |  SELECT s.year, s.month, s.day, s.file_count, s.small_count,
      |         coalesce(p.n_overlap, 0) AS n_overlap,
      |         coalesce(p.n_pairs, 0) AS n_pairs,
      |         s.needs_optimize,
      |         coalesce(p.n_overlap, 0) * 2 > coalesce(p.n_pairs, 0) AS cluster_bad
      |  FROM scored s LEFT JOIN pv p USING (year, month, day)
      |)
      |SELECT year, month, day, file_count, small_count, n_overlap, n_pairs,
      |       CASE WHEN needs_optimize AND cluster_bad THEN 'both'
      |            WHEN needs_optimize THEN 'small_files'
      |            ELSE 'clustering' END AS reason
      |FROM fused
      |WHERE needs_optimize OR cluster_bad
      |ORDER BY small_count + n_overlap DESC, year, month, day
      |LIMIT """.stripMargin + topN

  /** q141: TABLE GROWTH timeline — monthly file/record/byte additions
    * with running cumulative totals over the `$files` substrate: the
    * capacity-planning view an admin reads next to the browse rollups
    * (q2/q10 slice by partition; this slices by TIME and accumulates).
    * One bounded-cardinality aggregate (months), then a window over
    * months — control-plane sized. Money-typed file_size stays DECIMAL
    * through the cumulative sum, cast once at the edge (q56's
    * cumulative-revenue discipline). */
  def q141TableGrowth(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val monthly = MetaDerive.files(spark, d)
      .groupBy($"year", $"month")
      .agg(count(lit(1)).as("files_added"),
        sum($"record_count").as("records_added"),
        sum($"file_size").as("bytes_added"))
    val w = Window.orderBy($"year", $"month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("files_total", sum($"files_added").over(w))
      .withColumn("records_total", sum($"records_added").over(w))
      .withColumn("bytes_total", sum($"bytes_added").over(w).cast("double"))
      .withColumn("bytes_added", $"bytes_added".cast("double"))
      .select($"year", $"month", $"files_added", $"records_added",
        $"bytes_added", $"files_total", $"records_total", $"bytes_total")
      .orderBy($"year", $"month")
  }

  val q141Sql: String = MetaDerive.filesCte +
    """,
      |monthly AS (
      |  SELECT year, month, count(*) AS files_added,
      |         CAST(sum(record_count) AS BIGINT) AS records_added,
      |         sum(file_size) AS bytes_added
      |  FROM files GROUP BY 1, 2
      |)
      |SELECT year, month, files_added, records_added,
      |       CAST(bytes_added AS DOUBLE) AS bytes_added,
      |       CAST(sum(files_added) OVER w AS BIGINT) AS files_total,
      |       CAST(sum(records_added) OVER w AS BIGINT) AS records_total,
      |       CAST(sum(bytes_added) OVER w AS DOUBLE) AS bytes_total
      |FROM monthly
      |WINDOW w AS (ORDER BY year, month
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY year, month""".stripMargin

  /** q136: CLUSTERING-QUALITY audit — the data-layout sibling of
    * needs_optimize (A7 sizes files; this measures whether their KEY
    * RANGES overlap). Per partition, every file carries a
    * [min, max] l_partkey zone; files whose zones intersect cannot be
    * pruned apart by a partkey predicate, so the overlap count is the
    * direct "rewrite with sort order / z-order" signal an admin acts on
    * (the reference's rewrite_data_files supports exactly that knob;
    * graft.functions.ZOrder is the engine-side path).
    *
    * Scale: per-file zone stats are one partial agg over the scan; the
    * pair comparison joins files WITHIN a partition only (≤ C(8,2)
    * pairs here; real manifests are also partition-bounded), never
    * across the table. Integer counts out. */
  // The per-(partition, file) key zones are metadata-substrate like
  // MetaDerive.files (they ARE the zone maps an Iceberg manifest / the
  // skipping index holds per file) and two registered queries consume
  // them (q136 directly, q142 through the fused advisory) — same
  // materialize-once discipline as the files cache. Optimization r17:
  // q142 previously re-derived this whole lineitem aggregate on top of
  // running its own partitionStats pass.
  private val zoneCache =
    new graft.util.PlanCache[(SparkSession, String), DataFrame](
      maxEntries = 4, onEvict = _.unpersist())

  private def fileZones(spark: SparkSession, d: String): DataFrame =
    zoneCache.getOrElseUpdate((spark, d)) {
      import spark.implicits._
      graft.sources.Tables.lineitem(spark, d)
        .withColumn("year", date_format($"l_shipdate", "yyyy"))
        .withColumn("month", date_format($"l_shipdate", "MM"))
        .withColumn("day", date_format($"l_shipdate", "dd"))
        .withColumn("file_id", pmod($"l_orderkey", lit(8)).cast("int"))
        .groupBy($"year", $"month", $"day", $"file_id")
        .agg(min($"l_partkey").as("mn"), max($"l_partkey").as("mx"))
        .cache()
    }

  /** Unordered clustering summary shared by q136 (which orders it) and
    * q142 (which joins it — an ORDER BY below a join is wasted work). */
  private def clusteringSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // Pair comparison is ROW-LOCAL: a partition holds ≤8 file zones, so
    // collect them into one array per partition and count overlapping
    // pairs with nested transforms — no self-join (which would recompute
    // the zone lineage per side; exchange reuse doesn't fire across the
    // alias asymmetry), no second scan. C(n,2) per row, n ≤ 8.
    fileZones(spark, d).groupBy($"year", $"month", $"day")
      .agg(collect_list(struct($"mn", $"mx")).as("zs"))
      .withColumn("n_files", size($"zs").cast("long"))
      .withColumn("n_pairs",
        ($"n_files" * ($"n_files" - 1) / 2).cast("long"))
      .withColumn("n_overlap", aggregate(
        flatten(transform($"zs", (a, i) =>
          transform(slice($"zs", i + 2, greatest(size($"zs"), lit(1))),
            b => (a.getField("mn") <= b.getField("mx") &&
                  b.getField("mn") <= a.getField("mx")).cast("long")))),
        lit(0L), (acc, x) => acc + x))
      .select($"year", $"month", $"day", $"n_files", $"n_pairs", $"n_overlap")
  }

  def q136ClusteringQuality(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    clusteringSummary(spark, d).orderBy($"year", $"month", $"day")
  }

  val q136Sql: String =
    """WITH ranges AS (
      |  SELECT strftime(l_shipdate, '%Y') AS year,
      |         strftime(l_shipdate, '%m') AS month,
      |         strftime(l_shipdate, '%d') AS day,
      |         CAST(l_orderkey % 8 AS INT) AS file_id,
      |         min(l_partkey) AS mn, max(l_partkey) AS mx
      |  FROM lineitem GROUP BY 1, 2, 3, 4
      |), nf AS (
      |  SELECT year, month, day, count(*) AS n_files
      |  FROM ranges GROUP BY 1, 2, 3
      |), pv AS (
      |  SELECT a.year, a.month, a.day,
      |         CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN a.mn <= b.mx AND b.mn <= a.mx
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      |  FROM ranges a JOIN ranges b
      |    ON a.year = b.year AND a.month = b.month AND a.day = b.day
      |   AND a.file_id < b.file_id
      |  GROUP BY 1, 2, 3
      |)
      |SELECT n.year, n.month, n.day, n.n_files,
      |       coalesce(p.n_pairs, 0) AS n_pairs,
      |       coalesce(p.n_overlap, 0) AS n_overlap
      |FROM nf n LEFT JOIN pv p USING (year, month, day)
      |ORDER BY year, month, day""".stripMargin
}
