package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING banded-interval index: the serving-side complement of the
  * range-join family.
  *
  * [[IntervalJoin.pointInInterval]] (and the planner rewrite) explode
  * the interval side onto covering time bands per QUERY — the right
  * trade when intervals flow through once. When the same validity /
  * attribution-window table is probed by many point batches (the
  * lakehouse-admin serving pattern: a dimension of window rows, a
  * stream of fact lookups — reference service_refresh.go's standing
  * join tables), the explode should be paid ONCE and persisted:
  *
  *  - the store holds the intervals ALREADY exploded, as parquet
  *    PARTITIONED BY the band column (plus an ingest-batch level for
  *    idempotent appends — same layout discipline as
  *    [[VectorIndexStore]]'s cent_id lists);
  *  - a lookup computes each point's single band and equi-joins on
  *    (key, band): because `band` is a PARTITION column, Spark's
  *    dynamic partition pruning reduces the store scan to exactly the
  *    time slices present in the point batch — a day of points against
  *    a year of intervals reads ~`window/band + 1` partitions, not the
  *    year (IntervalIndexStoreSpec pins the `dynamicpruning` filter in
  *    the scan);
  *  - appends are REPLAY-IDEMPOTENT: each batch overwrites its own
  *    `ingest_batch=<label>` directory (the same crash-between-write-
  *    and-commit contract as [[graft.streaming.StreamingAttribution
  *    .attributionSink]]), so an at-least-once ingest pipeline
  *    converges.
  *
  * Band width is fixed at build time and recorded in `_meta.json`;
  * lookups read it from the store, so a caller can never probe with a
  * mismatched band. Degenerate (`start > end`) and NULL-bounded rows
  * are dropped at build — they can never match (same contract as the
  * library join).
  *
  * 100 TB: the store scales as Σ interval-length/band (≈2 rows per
  * interval at a sane band), partition count as timespan/band; lookups
  * shuffle only the point batch. A hot key splits across its bands
  * exactly like the in-flight join.
  */
object IntervalIndexStore {

  private def intervalsPath(dir: String) = s"$dir/intervals"
  private def metaPath(dir: String) = s"$dir/_meta.json"

  /** Build (or rebuild) the store from an interval frame. Columns
    * `key`, `start`, `end` plus payload; everything is kept. */
  def build(intervals: DataFrame, dir: String, key: String, start: String,
      end: String, bandSeconds: Long): Unit = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    writeBatch(intervals, dir, key, start, end, bandSeconds, "base")
    val meta = s"""{"key":"$key","start":"$start","end":"$end",""" +
      s""""bandSeconds":$bandSeconds}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(metaPath(dir)), meta)
  }

  /** Append an interval batch under its own `ingest_batch=<label>`
    * directory — replaying the same label OVERWRITES it (idempotent
    * under at-least-once delivery). */
  def append(delta: DataFrame, dir: String, label: String): Unit = {
    val m = meta(dir)
    require(label != "base" && label.nonEmpty, "label 'base' is reserved")
    writeBatch(delta, dir, m.key, m.start, m.end, m.bandSeconds, label)
  }

  private def writeBatch(intervals: DataFrame, dir: String, key: String,
      start: String, end: String, bandSeconds: Long, label: String): Unit = {
    val band = bandSeconds * 1000000L
    intervals
      .where(col(key).isNotNull && col(start).isNotNull &&
        col(end).isNotNull && col(start) <= col(end))
      .withColumn("band", explode(sequence(
        expr(s"unix_micros($start) div ${band}L"),
        expr(s"unix_micros($end) div ${band}L"))))
      .write.mode(SaveMode.Overwrite).partitionBy("band")
      .parquet(s"${intervalsPath(dir)}/ingest_batch=$label")
  }

  private[operators] case class Meta(key: String, start: String, end: String,
      bandSeconds: Long)

  private[operators] def meta(dir: String): Meta = {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(metaPath(dir)))
    def s(field: String) =
      s""""$field":"([^"]+)"""".r.findFirstMatchIn(raw).get.group(1)
    val b = """"bandSeconds":(\d+)""".r.findFirstMatchIn(raw).get.group(1).toLong
    Meta(s("key"), s("start"), s("end"), b)
  }

  /** Point lookup against the standing store: one equi-join on
    * (key, band) with the exact BETWEEN as post-filter — identical
    * semantics to [[IntervalJoin.pointInInterval]] on the CURRENT store
    * contents (spec-pinned). Interval payload columns come back
    * prefixed with `intervalPrefix`. The band equality is on the
    * store's PARTITION column, so dynamic partition pruning restricts
    * the scan to the point batch's bands. */
  def lookup(spark: SparkSession, dir: String, points: DataFrame, ts: String,
      intervalPrefix: String = "i_"): DataFrame = {
    val m = meta(dir)
    val band = m.bandSeconds * 1000000L
    val store = spark.read.parquet(intervalsPath(dir))
    val iPayload = store.columns
      .filterNot(c => c == m.key || c == "band" || c == "ingest_batch").toSeq
    val p = points
      .where(col(m.key).isNotNull && col(ts).isNotNull)
      .withColumn("__pband", expr(s"unix_micros($ts) div ${band}L"))
    val i = store.select(col(m.key).as("__ikey"), col("band").as("__iband"),
      struct(iPayload.map(col): _*).as("__ipay"))
    p.join(i, p(m.key) === i("__ikey") && p("__pband") === i("__iband"))
      .where(col(ts).between(col(s"__ipay.${m.start}"), col(s"__ipay.${m.end}")))
      .select(points.columns.map(col).toSeq ++
        iPayload.map(c => col(s"__ipay.$c").as(s"$intervalPrefix$c")): _*)
  }

  /** Store audit: banded row count, interval count, batches, partitions
    * — the cheap staleness/shape check an operator dashboard reads. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val store = spark.read.parquet(intervalsPath(dir))
    store.agg(
      count(lit(1)).as("banded_rows"),
      countDistinct(col("ingest_batch")).as("ingest_batches"),
      countDistinct(col("band")).as("bands"))
  }

  // ---- q156: standing-store attribution ------------------------------

  private val builtFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q156: q63's attribution aggregate, served from the STANDING
    * interval index instead of an in-flight explode — the store is
    * built once per session per dataset (the serving pattern), then the
    * purchase batch probes it. Result is hash-checked against the SAME
    * static DuckDB oracle as q63: the store path must be semantically
    * invisible. */
  def q156StandingAttribution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = builtFor.computeIfAbsent(d, { _ =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ivx-").toString
      val views = graft.sources.Tables.events(spark, d)
        .where($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
          ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
      build(views, dir, key = "user_id", start = "w_start", end = "w_end",
        bandSeconds = 3L * 86400L)
      dir
    })
    val purchases = graft.sources.Tables.events(spark, d)
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    lookup(spark, dir, purchases, ts = "ts")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"i_view_id").as("n_views"),
        countDistinct($"event_id").as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("attributed_value"))
      .orderBy($"user_id")
  }

  /** Session-teardown/data-regeneration reset (mirrors the other
    * derived-store caches' contract). */
  def clearSessionState(): Unit = builtFor.clear()
}
